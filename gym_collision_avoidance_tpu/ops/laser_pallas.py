"""Pallas-fused windowed/beam-compacted laserscan (round-5 experiment).

The XLA formulation (obs/sensors.py:_windowed_beam_compacted) runs as
three materialized stages per 128-beam block: the [A, S, Lb] screen +
bit-packed field words (17% of device time is that pack materialization,
PERF.md round-4 roofline), the [A, Cs+1, S, Lb] compact reduce (69%),
and the [A, Cs, Wn, Lb] window pass.  This kernel fuses all three in
VMEM: the source loop keeps a running slot count and writes the <= Cs
band-crossing sources' fields into per-slot registers (no packing, no
[*, S, Lb] tensors ever reach HBM), then the window pass and the
two-smallest-distinct reduction run in the same kernel body.

Semantics: identical to the XLA path — same screen predicate, same slot
order (stable first-come order along the source axis), same integer hit
test and first-two-hit rule, same closed-form span guard (computed in
the jnp wrapper; it has no beam axis).  Two deliberate deviations, both
strictly more accurate:

* the slot-overflow guard is the DIRECT condition (some beam sees a
  (Cs+1)-th relevant source) instead of the packed-word-nonzero probe —
  the probe is the packed approximation of exactly this;
* no irsq <= 63 clamp (it existed only to fit the 30-bit pack), so
  radii > 0.79 m on a 0.1 m grid work instead of tripping the guard.

f32-only (the serving dtype); callers keep the XLA path for f64 parity.
Selected via ``obs.sensors._WBC_PALLAS`` (A/B: scripts/ab_laser_r5.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(A, S, Cs, Wn, Lb, R, res, cell, oi, oj, H, W_map,
                 t_max_f, max_range):
    import numpy as np

    # python-float f32 constants: weak-typed, so every op below stays
    # f32 with the exact same constant values as the XLA kernel
    res_f = float(np.float32(res))
    max_range_f = float(np.float32(max_range))

    def kernel(pos_x, pos_y, gie, gje, rsqe, cosr, sinr,
               gid, gjd, irsqd, relxd, relyd, rel2d, ro2d, spand,
               out_ref, ovf_ref):
        # f32-ONLY kernel: every quantity here is an exactly-representable
        # small integer or an f32 the XLA path also computes in f32, so
        # keeping indices/counts in f32 (instead of int32, whose vector
        # multiply lowers poorly on the VPU) changes no boolean and no
        # output bit — floor/clip/compare on exact integers are exact.
        one = jnp.float32(1.0)
        zero = jnp.float32(0.0)
        cos = cosr[:]                                            # [A, Lb]
        sin = sinr[:]
        px0 = pos_x[:]                                           # [A, 1]
        py0 = pos_y[:]

        count = jnp.zeros((A, Lb), jnp.float32)
        ovf = jnp.zeros((A, Lb), jnp.float32)
        sk0 = [jnp.zeros((A, Lb), jnp.float32) for _ in range(Cs)]
        sgi = [jnp.zeros((A, Lb), jnp.float32) for _ in range(Cs)]
        sgj = [jnp.zeros((A, Lb), jnp.float32) for _ in range(Cs)]
        srs = [jnp.zeros((A, Lb), jnp.float32) for _ in range(Cs)]

        # ---- screen + compact: stable first-come slot fill over S ----
        # per-(ego, source) scalars (relx/rely/rel2/r_o^2) precomputed in
        # the jnp wrapper — no beam axis, identical values
        for s in range(S):
            relx = relxd[:, s : s + 1]                           # [A, 1]
            rely = relyd[:, s : s + 1]
            t_c = relx * cos + rely * sin                        # [A, Lb]
            bb = rel2d[:, s : s + 1] - t_c * t_c
            disc = ro2d[:, s : s + 1] - bb
            half_o = jnp.sqrt(jnp.maximum(disc, 0.0))
            t_lo = t_c - half_o
            t_hi = t_c + half_o
            rel = (
                (disc > 0.0) & (t_hi >= 0.0) & (t_lo <= t_max_f)
                & (spand[:, s : s + 1] != 0.0)
            )
            k0 = jnp.clip(
                jnp.floor(t_lo / res_f) - 1.0, 0.0, float(R)
            )
            for cs in range(Cs):
                selcs = rel & (count == float(cs))
                sk0[cs] = jnp.where(selcs, k0, sk0[cs])
                sgi[cs] = jnp.where(selcs, gid[:, s : s + 1], sgi[cs])
                sgj[cs] = jnp.where(selcs, gjd[:, s : s + 1], sgj[cs])
                srs[cs] = jnp.where(selcs, irsqd[:, s : s + 1], srs[cs])
            ovf = jnp.where(rel & (count == float(Cs)), one, ovf)
            count = count + jnp.where(rel, one, zero)

        # ---- window pass: per-slot two-smallest chains (independent,
        # ILP-friendly) merged pairwise at the end ----
        BIG = float(R)
        gie_v = gie[:]
        gje_v = gje[:]
        rsqe_v = rsqe[:]
        pairs = []
        for cs in range(Cs):
            m1 = jnp.full((A, Lb), BIG, jnp.float32)
            m2 = jnp.full((A, Lb), BIG, jnp.float32)
            for w in range(Wn):
                k = sk0[cs] + float(w)
                rr = k * res_f
                pxs = px0 + rr * cos
                pys = py0 + rr * sin
                ii = jnp.floor(oi - pys / cell)
                jj = jnp.floor(oj + pxs / cell)
                in_map = (ii >= 0.0) & (ii < H) & (jj >= 0.0) & (jj < W_map)
                di = ii - sgi[cs]
                dj = jj - sgj[cs]
                in_src = di * di + dj * dj < srs[cs]
                dei = ii - gie_v
                dej = jj - gje_v
                in_ego = dei * dei + dej * dej < rsqe_v
                hit = in_src & (~in_ego) & in_map
                idx = jnp.where(hit, k, BIG)
                lt1 = idx < m1
                m2 = jnp.where(
                    lt1, m1, jnp.where((idx > m1) & (idx < m2), idx, m2)
                )
                m1 = jnp.where(lt1, idx, m1)
            pairs.append((m1, m2))

        def merge(a, b):
            """Two smallest DISTINCT of the union of two sorted-distinct
            pairs (values in [0, BIG], BIG = miss sentinel)."""
            a1, a2 = a
            b1, b2 = b
            lo = jnp.minimum(a1, b1)
            # smallest value in each chain strictly above lo (chains are
            # sorted-distinct, so this needs one select per chain)
            ca = jnp.where(a1 > lo, a1, a2)
            cb = jnp.where(b1 > lo, b1, b2)
            return lo, jnp.minimum(ca, cb)

        while len(pairs) > 1:
            nxt = [
                merge(pairs[i], pairs[i + 1])
                if i + 1 < len(pairs) else pairs[i]
                for i in range(0, len(pairs), 2)
            ]
            pairs = nxt
        m1, m2 = pairs[0]

        ans_k = jnp.where(
            m1 >= BIG, -1.0, jnp.where(m2 >= BIG, float(R - 1), m2 - 1.0)
        )
        out_ref[:] = jnp.where(
            ans_k >= 0.0, ans_k * res_f, max_range_f
        ).astype(jnp.float32)
        ovf_ref[:] = ovf

    return kernel


def windowed_beam_compacted_pallas(pos_e, gi_e, gj_e, rsq_e, cos_b, sin_b,
                                   gi_d, gj_d, rsq_d, cx_d, cy_d,
                                   cfg, H, W_map, Wn, dtype, span_ok=None):
    """Drop-in for sensors._windowed_beam_compacted (f32, see module doc)."""
    from gym_collision_avoidance_tpu.obs import sensors as S_mod

    R = S_mod.LASER_NUM_RANGE_SAMPLES
    Cs = cfg.laserscan_beam_slots
    cell = cfg.map_grid_cell_size
    res = float(S_mod.LASER_RANGE_RESOLUTION)
    oi = (cfg.map_y_width / 2.0) / cell
    oj = (cfg.map_x_width / 2.0) / cell
    import numpy as np

    A, S = gi_d.shape
    Lb = cos_b.shape[1]
    res32 = jnp.asarray(res, dtype)
    # static f32 constant, identical to the XLA kernel's (R-1)*res32
    t_max_np = float(np.float32(R - 1) * np.float32(res))

    # ---- span guard: closed-form per-source bound, verbatim from the
    # XLA kernel (no beam axis — stays in jnp) ----
    r_out = (jnp.sqrt(rsq_d) + S_mod._WINDOW_CELL_SLACK) * cell  # [A, S]
    r_in = jnp.maximum(jnp.sqrt(rsq_d) - S_mod._WINDOW_CELL_SLACK, 0.0) * cell
    dmax = 2.0 * jnp.sqrt(
        jnp.maximum(r_out**2 - r_in**2, 0.0) + (res32 / 2.0) ** 2
    )
    span_bound = jnp.floor((dmax + res32 / 2.0) / res32).astype(jnp.int32) + 4
    src_used = rsq_d > 0
    if span_ok is not None:
        src_used = src_used & span_ok
    span_overflow = jnp.any(src_used & (span_bound > Wn))

    irsq = (jnp.floor(rsq_d) + (rsq_d > jnp.floor(rsq_d))).astype(jnp.int32)
    span_i = (
        jnp.ones((A, S), jnp.int32) if span_ok is None
        else span_ok.astype(jnp.int32)
    )

    kernel = _make_kernel(
        A, S, Cs, Wn, Lb, R, res, cell, oi, oj, H, W_map,
        t_max_np, float(S_mod.LASER_MAX_RANGE),
    )
    f32 = jnp.float32
    # per-(ego, source) screen scalars — no beam axis, computed once here
    # with the exact op sequence of the XLA kernel
    relx = cx_d - pos_e[:, 0][:, None]
    rely = cy_d - pos_e[:, 1][:, None]
    rel2 = relx * relx + rely * rely
    ro2 = r_out * r_out
    out, ovf_mask = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((A, Lb), f32),
            jax.ShapeDtypeStruct((A, Lb), f32),
        ],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 15,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    )(
        # every integer input is a small exact integer: f32 carries it
        # exactly, and the kernel is pure-f32 (see its docstring)
        pos_e[:, 0:1].astype(f32), pos_e[:, 1:2].astype(f32),
        gi_e[:, None].astype(f32), gj_e[:, None].astype(f32),
        rsq_e[:, None].astype(f32),
        cos_b.astype(f32), sin_b.astype(f32),
        gi_d.astype(f32), gj_d.astype(f32), irsq.astype(f32),
        relx.astype(f32), rely.astype(f32), rel2.astype(f32),
        ro2.astype(f32), span_i.astype(f32),
    )
    overflow = span_overflow | jnp.any(ovf_mask != 0)
    return out.astype(dtype), overflow
