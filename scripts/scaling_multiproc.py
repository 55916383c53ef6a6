"""Measured multi-PROCESS scaling: the DCN-analog data point.

Every other SCALING.md table runs inside one process, where the mesh's
collectives ride XLA's in-process shared-memory transport (the ICI
analog on CPU).  This script measures the rollout with the env axis
sharded across real OS processes under ``jax.distributed`` — the
cross-process Gloo transport is the CPU stand-in for DCN, so the
in-process vs cross-process delta bounds the collective-transport cost
the projection model needs (SURVEY §2.3 obligation 2).

Rows (all 4-agent circle, in-graph rollout, median of --reps):
  fixed work:   E=ENVS, S=STEPS on 1x4 / 2x2 / 4x1 (procs x devices) —
                same global work and device count, only the transport
                boundary moves
  weak scaling: E/device held constant from 1x2 to 2x2

Prints one markdown table + one JSON line; paste into SCALING.md.

Usage: python scripts/scaling_multiproc.py [--envs 512] [--steps 128]
           [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

SCRIPT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "launch_multihost.py")


def run_point(procs, dev_per_proc, envs, steps, reps, port):
    cmd = [
        sys.executable, SCRIPT, "--spawn", str(procs),
        "--devices-per-host", str(dev_per_proc),
        "--num-envs", str(envs), "--steps", str(steps),
        "--reps", str(reps), "--port", str(port),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=900)
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"no JSON from {procs}x{dev_per_proc}:\n{out.stdout}\n{out.stderr}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=512)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--port", type=int, default=7841)
    args = ap.parse_args()

    rows = []
    # fixed work, 4 global devices, the process boundary sweeps 1 -> 4
    for procs, dev in [(1, 4), (2, 2), (4, 1)]:
        r = run_point(procs, dev, args.envs, args.steps, args.reps,
                      args.port + len(rows))
        rows.append(("fixed", procs, dev, args.envs, r))
        print(f"# fixed-work {procs}x{dev}: {r['agent_steps_per_s']:.3e}",
              file=sys.stderr)
    # weak scaling: E/device = envs/4 held constant
    for procs, dev, envs in [(1, 2, args.envs // 2), (2, 2, args.envs)]:
        r = run_point(procs, dev, envs, args.steps, args.reps,
                      args.port + len(rows))
        rows.append(("weak", procs, dev, envs, r))

    base = next(r for k, p, d, e, r in rows if (k, p, d) == ("fixed", 1, 4))
    weak1 = next(r for k, p, d, e, r in rows if (k, p, d) == ("weak", 1, 2))
    print("| regime | procs x dev/proc | envs | agent-steps/s | spread | "
          "efficiency |")
    print("|---|---|---|---|---|---|")
    out = {}
    for kind, procs, dev, envs, r in rows:
        if kind == "fixed":
            eff = r["agent_steps_per_s"] / base["agent_steps_per_s"]
        else:
            # weak: ideal = baseline throughput x device growth
            ideal = weak1["agent_steps_per_s"] * (procs * dev) / 2
            eff = r["agent_steps_per_s"] / ideal
        spread = (f"{r['spread_min']:.2e}..{r['spread_max']:.2e}")
        print(f"| {kind} | {procs} x {dev} | {envs} | "
              f"{r['agent_steps_per_s']:.3e} | {spread} | {eff:.1%} |")
        out[f"{kind}_{procs}x{dev}"] = {
            "agent_steps_per_s": r["agent_steps_per_s"],
            "efficiency": eff,
            "checksum": r["metrics_checksum"],
        }
    # the checksum must be transport-invariant (bit-identical reductions)
    sums = {r["metrics_checksum"] for k, p, d, e, r in rows if k == "fixed"}
    out["fixed_checksums_identical"] = len(sums) == 1
    print(json.dumps(out))


if __name__ == "__main__":
    main()
