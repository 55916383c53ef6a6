"""Attribute device-trace time to source lines via HLO metadata.

The reference has no profiling at all (SURVEY.md §5.1); PERF.md's
"where the time goes" tables are built with this module.  Workflow:

1. capture a ``jax.profiler.trace`` around a jitted step/scan;
2. dump the SAME program's optimized HLO (``jit_fn.lower(...).compile()
   .as_text()`` — works through the axon remote-compile tunnel where
   ``--xla_dump_to`` does not, PERF.md round 2);
3. :func:`attribute` joins trace op durations to the HLO fusion bodies'
   ``metadata={... source_file=..., source_line=...}`` entries, so every
   fusion lands on the repo source lines it executes.

Attribution caveat: a fusion's duration is split EVENLY over the unique
source lines in its body — fine for "which subsystem dominates", not a
per-line cycle count.
"""

from __future__ import annotations

import glob
import gzip
import json
import re
from collections import defaultdict
from typing import Dict, Iterable, Tuple

# Trace rows that wrap the real device ops (jit umbrella, the scan while
# op, host-side rows): excluded from op accounting, but `while.N` is THE
# honest total-device-time row for a scanned step.
_UMBRELLA = re.compile(r"^(jit_|while|PjitFunction|Pjit|copy-start|copy-done|infeed|outfeed|\$|Thread|process)")


def trace_durations(outdir: str) -> Dict[str, float]:
    """Sum per-op-name durations (us) from the newest trace in outdir."""
    files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
    ev = json.load(gzip.open(sorted(files)[-1]))["traceEvents"]
    dur: Dict[str, float] = defaultdict(float)
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            if len(name) < 160:
                dur[name] += e["dur"]
    return dict(dur)


def scan_device_time_us(dur: Dict[str, float]) -> float:
    """Total device time (us) of the scanned while loop (largest while.N)."""
    whiles = [d for n, d in dur.items() if re.match(r"^while(\.\d+)?$", n)]
    return max(whiles) if whiles else 0.0


def hlo_sources(hlo_text: str) -> Dict[str, Tuple[str, ...]]:
    """Map each HLO instruction name to the unique repo source lines in
    its (fusion) body.

    Returns ``{instr_name: ("file.py:123", ...)}`` where instr_name
    matches the device-trace op name (e.g. ``select_reduce_fusion.10``).
    """
    # 1) collect, per computation, the source lines of its instructions
    comp_lines: Dict[str, list] = defaultdict(list)
    comp = None
    meta_re = re.compile(
        r'source_file="([^"]+)".*?source_line=(\d+)'
    )
    comp_re = re.compile(r"^\s*%?([\w\.\-]+)\s*(?:\([^)]*\))?\s*->.*\{\s*$")
    call_re = re.compile(r"calls=%?([\w\.\-]+)")
    instr_re = re.compile(r"^\s+(?:ROOT\s+)?%?([\w\.\-]+)\s*=")
    instr_comp: Dict[str, str] = {}
    for line in hlo_text.splitlines():
        mc = comp_re.match(line)
        if mc and "=" not in line.split("{")[0]:
            comp = mc.group(1)
            continue
        mi = instr_re.match(line)
        if comp and mi:
            name = mi.group(1)
            mcall = call_re.search(line)
            if mcall:
                instr_comp[name] = mcall.group(1)
            mm = meta_re.search(line)
            if mm:
                f = mm.group(1).split("/")[-1]
                comp_lines[comp].append(f"{f}:{mm.group(2)}")
            # top-level entry instructions attribute to themselves too
            if not mcall and comp and name not in instr_comp:
                instr_comp.setdefault(name, comp if mm is None else name)
                if mm:
                    comp_lines[name].append(f"{f}:{mm.group(2)}")
    out: Dict[str, Tuple[str, ...]] = {}
    for instr, called in instr_comp.items():
        lines = comp_lines.get(called) or comp_lines.get(instr) or []
        seen, uniq = set(), []
        for s in lines:
            if s not in seen:
                seen.add(s)
                uniq.append(s)
        out[instr] = tuple(uniq)
    return out


def attribute(dur: Dict[str, float], hlo_text: str,
              top: int = 25) -> Tuple[list, Dict[str, float]]:
    """Join trace durations to HLO source lines.

    Returns ``(rows, by_file)``: rows = [(dur_us, name, source_lines)]
    sorted by duration for the top ops (umbrellas excluded), and a
    per-source-file duration split (fusion time divided evenly over the
    unique files in its body).
    """
    srcs = hlo_sources(hlo_text)
    ops = [
        (d, n) for n, d in dur.items() if not _UMBRELLA.match(n)
    ]
    ops.sort(reverse=True)
    rows = [(d, n, srcs.get(n, ())) for d, n in ops[:top]]
    by_file: Dict[str, float] = defaultdict(float)
    for d, n in ops:
        lines = srcs.get(n, ())
        files = sorted({s.split(":")[0] for s in lines}) or ["<unattributed>"]
        for f in files:
            by_file[f] += d / len(files)
    return rows, dict(by_file)


def print_report(outdir: str, hlo_text: str, steps: int, envs: int,
                 top: int = 25) -> None:
    """Print the full attribution report for a traced scan."""
    dur = trace_durations(outdir)
    scan_us = scan_device_time_us(dur)
    if scan_us:
        per_step = scan_us / steps
        print(f"scan device time: {scan_us/1e3:.2f} ms for {steps} steps "
              f"-> {per_step:.1f} us/step "
              f"-> device ceiling {envs*1e6/per_step:,.0f} env-steps/s")
    rows, by_file = attribute(dur, hlo_text, top)
    optot = sum(d for n, d in dur.items() if not _UMBRELLA.match(n))
    print(f"\n-- top ops ({optot/1e3:.2f} ms op total) --")
    for d, n, lines in rows:
        src = " ".join(lines[:4]) + (" ..." if len(lines) > 4 else "")
        print(f"{d/1e3:9.2f} ms {100*d/max(optot,1):5.1f}%  {n:40s} {src}")
    print("\n-- by source file --")
    for f, d in sorted(by_file.items(), key=lambda kv: -kv[1]):
        print(f"{d/1e3:9.2f} ms {100*d/max(optot,1):5.1f}%  {f}")
