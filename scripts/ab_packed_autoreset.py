"""Within-session A/B: packed [N, D] reset-select vs per-leaf contraction.

Run on the real chip; interleaves reps so tunnel drift cancels.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.env import autoreset
from gym_collision_avoidance_tpu.policies import registry as P
from gym_collision_avoidance_tpu.scenarios import random_cases


def build(packed, num_envs, num_steps):
    cfg = EnvConfig(dtype="float32", done_mode="evaluate")
    pool = jnp.asarray(
        random_cases.scenario_pool(64, 4, seed=0, side_length=4.0), jnp.float32
    )
    policy_id = np.full(4, P.NONCOOP, np.int32)
    astep = autoreset.make_autoreset_step(cfg, pool, policy_id, packed=packed)

    states = jax.vmap(
        lambda i: autoreset.state_from_case(cfg, pool[i % 64], policy_id)
    )(jnp.arange(num_envs))
    counters = jnp.arange(num_envs, dtype=jnp.int32)

    def body(carry, _):
        st, c = carry
        st, c, obs, rew, go = jax.vmap(astep)(st, c)
        return (st, c), (jnp.mean(rew), jnp.sum(obs["dist_to_goal"]))

    @jax.jit
    def run(carry):
        return jax.lax.scan(body, carry, None, length=num_steps)

    carry = (states, counters)
    carry, _ = run(carry)
    jax.block_until_ready(carry[0])
    return run, carry


def main(num_envs=8192, num_steps=1024, reps=5):
    runs = {name: build(p, num_envs, num_steps) for name, p in
            [("per-leaf", False), ("packed", True)]}
    rates = {name: [] for name in runs}
    for _ in range(reps):
        for name, (run, carry) in runs.items():
            t0 = time.perf_counter()
            out, _ = run(carry)
            jax.block_until_ready(out[0])
            rates[name].append(num_envs * num_steps / (time.perf_counter() - t0))
    for name, rs in rates.items():
        print(f"{name:9s} median {np.median(rs):.3e}  min {min(rs):.3e}  max {max(rs):.3e}")


if __name__ == "__main__":
    main()
