"""Throughput benchmark: env-steps/s per chip.

Headline: the steady-state SERVING loop — 4 agents/env, NonCooperative
policies, other-agents-states sensor, full reward/termination pipeline,
float32, with in-graph episode auto-reset from a 64-scenario pool
(env/autoreset.py).  Every step advances a LIVE episode; there is no
masked-but-finished compute inflating the number (episodes in the raw
fixed-scan config mostly finish early — that rate is reported as a
secondary field, ``raw_scan_env_steps_per_sec``).

Sized to be compute-bound (E=8192 envs x S=1024 steps per dispatch;
measured sweet spot — E=16384 reads ~10% lower, S=512 ~4% lower) and
measured as the median over 5 reps with the min/max spread recorded, so
the number is robust to the axon tunnel's dispatch jitter.  Prints ONE
JSON line.

The baseline (vs_baseline denominator) is the reference Python simulator
measured on this machine's CPU for the identical scenario family (1 env,
4-agent cases, NonCoop + OtherAgentsStatesSensor): 1438 env-steps/s
(BASELINE.md; the reference has no published numbers, SURVEY.md §6).
"""

import json
import time

import numpy as np

REFERENCE_CPU_STEPS_PER_SEC = 1438.0


def _bench_serving(jax, jnp, num_envs=8192, num_steps=1024, reps=5):
    """Auto-reset steady-state loop: env-steps/s with live episodes."""
    from gym_collision_avoidance_tpu import EnvConfig
    from gym_collision_avoidance_tpu.env import autoreset
    from gym_collision_avoidance_tpu.policies import registry as P
    from gym_collision_avoidance_tpu.scenarios import random_cases

    cfg = EnvConfig(dtype="float32", done_mode="evaluate")
    pool = jnp.asarray(
        random_cases.scenario_pool(64, 4, seed=0, side_length=4.0), jnp.float32
    )
    policy_id = np.full(4, P.NONCOOP, np.int32)
    astep = autoreset.make_autoreset_step(cfg, pool, policy_id)

    states = jax.vmap(
        lambda i: autoreset.state_from_case(cfg, pool[i % 64], policy_id)
    )(jnp.arange(num_envs))
    counters = jnp.arange(num_envs, dtype=jnp.int32)

    def body(carry, _):
        st, c = carry
        st, c, obs, rew, go = jax.vmap(astep)(st, c)
        # consume the obs so XLA cannot dead-code-eliminate the sensor
        # (NonCoop itself never reads it) — keeps the number honest.
        return (st, c), (jnp.mean(rew), jnp.sum(obs["dist_to_goal"]))

    @jax.jit
    def run(carry):
        return jax.lax.scan(body, carry, None, length=num_steps)

    carry = (states, counters)
    carry, _ = run(carry)  # warmup/compile
    jax.block_until_ready(carry[0])

    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        carry, _m = run(carry)
        jax.block_until_ready(carry[0])
        rates.append(num_envs * num_steps / (time.perf_counter() - t0))
    episodes = int(jnp.sum(carry[1] - jnp.arange(num_envs)))
    return rates, episodes


def _bench_raw_scan(jax, jnp, num_envs=4096, num_steps=256, reps=3):
    """The fixed-scenario fixed-scan rate (episodes finish early and idle;
    kept as a secondary, directly-comparable-to-r1 number)."""
    from gym_collision_avoidance_tpu import EnvConfig
    from gym_collision_avoidance_tpu.env.batch import batched_env_step
    from gym_collision_avoidance_tpu.scenarios import presets

    cfg = EnvConfig(dtype="float32")
    sc = presets.circle_scenario(4, radius=3.0, agent_radius=0.5)
    state = sc.to_state(cfg)
    states = jax.tree.map(lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape), state)
    active = sc.active_policies

    def body(states, _):
        states, obs, rew, go, _info = batched_env_step(states, None, cfg, None, active)
        obs_sum = jnp.sum(obs["other_agents_states"]) + jnp.sum(obs["dist_to_goal"])
        return states, (jnp.mean(rew), obs_sum, jnp.mean(go.astype(jnp.float32)))

    @jax.jit
    def run(states):
        return jax.lax.scan(body, states, None, length=num_steps)

    states, _ = run(states)
    jax.block_until_ready(states)
    t0 = time.perf_counter()
    for _ in range(reps):
        states, metrics = run(states)
    jax.block_until_ready(states)
    dt = time.perf_counter() - t0
    return num_envs * num_steps * reps / dt


def main():
    import jax
    import jax.numpy as jnp

    rates, episodes = _bench_serving(jax, jnp)
    headline = float(np.median(rates))
    raw = _bench_raw_scan(jax, jnp)

    print(
        json.dumps(
            {
                "metric": "serving_env_steps_per_sec_4agent_noncoop_autoreset",
                "value": round(headline, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(headline / REFERENCE_CPU_STEPS_PER_SEC, 2),
                "spread_min": round(min(rates), 1),
                "spread_max": round(max(rates), 1),
                "episodes_completed": episodes,
                "raw_scan_env_steps_per_sec": round(raw, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
