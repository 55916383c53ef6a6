"""Round-5 A/B: other-agents sensor select formulations on the serving loop.

The round-5 headline trace (profile_autoreset.py 16384 128) put the
sensor's one-hot K-slot selection at ~29% of device time: a 6-output
select_reduce fusion (per-field masked sums, sensors.py pick_field) plus
a separate [E, A, K, 7] concatenate.  Variants:

  base      shipped per-field masked sums + output stack
  stack_in  ONE broadcast reduce producing [A, K, 7] directly
            (sensors._SELECT_STACK_IN)

Run on the TPU chip; verifies bitwise-identical final states + episode
counters across variants and exits nonzero on mismatch.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.env import autoreset
from gym_collision_avoidance_tpu.obs import sensors
from gym_collision_avoidance_tpu.policies import registry as P
from gym_collision_avoidance_tpu.scenarios import random_cases


def build(E, S):
    cfg = EnvConfig(dtype="float32", done_mode="evaluate")
    pool = jnp.asarray(
        random_cases.scenario_pool(64, 4, seed=0, side_length=4.0), jnp.float32
    )
    policy_id = np.full(4, P.NONCOOP, np.int32)
    astep = autoreset.make_autoreset_step(cfg, pool, policy_id)
    states = jax.vmap(
        lambda i: autoreset.state_from_case(cfg, pool[i % 64], policy_id)
    )(jnp.arange(E))
    counters = jnp.arange(E, dtype=jnp.int32)

    def body(carry, _):
        st, c = carry
        st, c, obs, rew, go = jax.vmap(astep)(st, c)
        return (st, c), (jnp.mean(rew), jnp.sum(obs["dist_to_goal"]))

    @jax.jit
    def run(carry):
        return jax.lax.scan(body, carry, None, length=S)

    return run, (states, counters)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--pipeline", type=int, default=8)
    args = ap.parse_args()
    E, S = args.envs, args.steps

    finals = {}
    fail = False
    base_flag = sensors._SELECT_STACK_IN
    try:
        for name, flag in (("base", False), ("stack_in", True)):
            sensors._SELECT_STACK_IN = flag
            # inner @jax.jit (env_step) caches its trace across variant
            # builds — clear so the flag actually takes effect
            jax.clear_caches()
            run, carry0 = build(E, S)
            carry, _ = run(carry0)  # compile + warmup
            jax.block_until_ready(carry[0])
            rates = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                for _p in range(args.pipeline):
                    carry, _m = run(carry)
                jax.block_until_ready(carry[0])
                rates.append(
                    args.pipeline * E * S / (time.perf_counter() - t0)
                )
            finals[name] = jax.device_get(carry)
            rates.sort()
            print(json.dumps({
                "variant": name,
                "env_steps_per_sec": round(rates[len(rates) // 2], 1),
                "spread_min": round(rates[0], 1),
                "spread_max": round(rates[-1], 1),
            }))
    finally:
        sensors._SELECT_STACK_IN = base_flag

    ref = finals["base"]
    for name, fin in finals.items():
        if name == "base":
            continue
        ok = all(
            bool(np.array_equal(a, b, equal_nan=True))
            for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(fin))
        )
        print(f"bitwise state+counter match base vs {name}: {ok}")
        fail |= not ok

    if fail:
        sys.exit("FAIL: variant mismatch")


if __name__ == "__main__":
    main()
