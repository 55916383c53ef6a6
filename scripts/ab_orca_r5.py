"""Round-5 A/B: rolled vs statically-unrolled ORCA LP loops (orca4 loop).

The round-5 orca4 trace (profile_serving.py orca4 16384 128) put
ops/orca.py at 53% of device time, much of it in the LP1/LP2/LP3
constraint-insertion fori loops.  At NL = A-1 = 3 those unroll statically
(ops/orca.py UNROLL_MAX_NL): k becomes a compile-time constant, the k=0
prefix masks vanish, and iterations fuse.  This script verifies the
unrolled form is bit-identical on the serving loop (states + episode
counters) and measures both at bench scale.  Exits nonzero on mismatch.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from gym_collision_avoidance_tpu.ops import orca
from gym_collision_avoidance_tpu.policies import registry as P

import profile_serving


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--pipeline", type=int, default=8)
    ap.add_argument("--natural", action="store_true",
                    help="A/B the round-5 natural-space LP (permuted vs "
                         "rank-masked) instead of rolled vs unrolled")
    args = ap.parse_args()
    E, S = args.envs, args.steps

    if args.natural:
        variants = (("permuted", (8, False)), ("natural", (8, True)))
    else:
        variants = (("rolled", (0, orca.NATURAL_LP)),
                    ("unrolled", (8, orca.NATURAL_LP)))

    finals = {}
    base = (orca.UNROLL_MAX_NL, orca.NATURAL_LP)
    try:
        for name, (thresh, nat) in variants:
            orca.UNROLL_MAX_NL = thresh
            orca.NATURAL_LP = nat
            # inner @jax.jit functions (env_step, orca_velocities) cache
            # their traces across variant builds — without this the second
            # variant silently reuses the first's program
            jax.clear_caches()
            run, carry = profile_serving.build_autoreset(P.RVO, E, S)
            carry, _ = run(carry)  # compile + warmup
            jax.block_until_ready(carry[0])
            rates = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                for _p in range(args.pipeline):
                    carry, _m = run(carry)
                jax.block_until_ready(carry[0])
                rates.append(args.pipeline * E * S / (time.perf_counter() - t0))
            finals[name] = jax.device_get(carry)
            rates.sort()
            print(json.dumps({
                "variant": name,
                "env_steps_per_sec": round(rates[len(rates) // 2], 1),
                "spread_min": round(rates[0], 1),
                "spread_max": round(rates[-1], 1),
            }))
    finally:
        orca.UNROLL_MAX_NL, orca.NATURAL_LP = base

    names = [n for n, _ in variants]
    ok = all(
        bool(np.array_equal(a, b, equal_nan=True))
        for a, b in zip(
            jax.tree.leaves(finals[names[0]]), jax.tree.leaves(finals[names[1]])
        )
    )
    print(f"bitwise state+counter match {names[0]} vs {names[1]}: {ok}")
    if not ok:
        sys.exit("FAIL: LP variant diverged")


if __name__ == "__main__":
    main()
