"""Round-5 A/B: GA3C LSTM x-gate precompute vs per-step GEMM at T=19.

The round-5 ga3c40 trace (profile_serving.py ga3c40 256 64) put the
GA3C-CADRL net forward at 72.6% of device time, with the [B, T, 4H]
x_gates precompute alone at 26% (a 17.8 ms fusion at B=10240, T=19).
Variants flip models.ga3c_cadrl._LAZY_X_MIN_T:

  precompute  one batched [B,T,7]@[7,4H] matmul before the scan (r2 form)
  lazy        [B,7]@[7,4H] inside each unrolled scan step (no [B,T,4H])

Verifies bitwise-identical final states on the fixed-scan ga3c40 loop
and measures both; optional E sweep.  Exits nonzero on mismatch.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from gym_collision_avoidance_tpu.models import ga3c_cadrl

import profile_serving


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, nargs="*", default=[256])
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--pipeline", type=int, default=2)
    args = ap.parse_args()

    base = ga3c_cadrl._LAZY_X_MIN_T
    fail = False
    try:
        for E in args.envs:
            finals = {}
            for name, thresh in (("precompute", 10**9), ("lazy", 8)):
                ga3c_cadrl._LAZY_X_MIN_T = thresh
                jax.clear_caches()  # inner-jit trace reuse (PERF.md r5)
                run, states = profile_serving.build_ga3c40(E, args.steps)
                states, _ = run(states)  # compile + warmup
                jax.block_until_ready(jax.tree.leaves(states)[0])
                rates = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    for _p in range(args.pipeline):
                        states, _m = run(states)
                    jax.block_until_ready(jax.tree.leaves(states)[0])
                    rates.append(
                        args.pipeline * E * args.steps
                        / (time.perf_counter() - t0)
                    )
                finals[name] = jax.device_get(states)
                rates.sort()
                print(json.dumps({
                    "variant": name, "envs": E,
                    "env_steps_per_sec": round(rates[len(rates) // 2], 1),
                    "spread_min": round(rates[0], 1),
                    "spread_max": round(rates[-1], 1),
                }))
            ok = all(
                bool(np.array_equal(a, b, equal_nan=True))
                for a, b in zip(
                    jax.tree.leaves(finals["precompute"]),
                    jax.tree.leaves(finals["lazy"]),
                )
            )
            print(f"bitwise state match precompute vs lazy (E={E}): {ok}")
            fail |= not ok
    finally:
        ga3c_cadrl._LAZY_X_MIN_T = base

    if fail:
        sys.exit("FAIL: lazy x-gates diverged")


if __name__ == "__main__":
    main()
