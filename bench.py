"""Throughput benchmark: env-steps/s per chip.

Config: 4 agents/env, NonCooperative policies, other-agents-states sensor,
full reward/termination pipeline, float32 — BASELINE.json config families.
Prints ONE JSON line.

The baseline (vs_baseline denominator) is the reference Python simulator
measured on this machine's CPU for the identical scenario (1 env, 4-agent
circle, NonCoop + OtherAgentsStatesSensor): 1438 env-steps/s
(see tests/oracle + /tmp provenance; reference has no published numbers,
SURVEY.md §6).
"""

import json
import time

import numpy as np

REFERENCE_CPU_STEPS_PER_SEC = 1438.0


def main():
    import jax
    import jax.numpy as jnp

    from gym_collision_avoidance_tpu import EnvConfig
    from gym_collision_avoidance_tpu.env.batch import batched_env_step
    from gym_collision_avoidance_tpu.scenarios import presets

    num_envs = 4096
    num_steps = 256
    cfg = EnvConfig(dtype="float32")
    sc = presets.circle_scenario(4, radius=3.0, agent_radius=0.5)
    state = sc.to_state(cfg)
    states = jax.tree.map(lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape), state)
    active = sc.active_policies

    def body(states, _):
        states, obs, rew, go, _info = batched_env_step(states, None, cfg, None, active)
        # consume the obs so XLA cannot dead-code-eliminate the sensor
        # (NonCoop itself never reads it) — keeps the number honest.
        obs_sum = jnp.sum(obs["other_agents_states"]) + jnp.sum(obs["dist_to_goal"])
        return states, (jnp.mean(rew), obs_sum, jnp.mean(go.astype(jnp.float32)))

    @jax.jit
    def run(states):
        return jax.lax.scan(body, states, None, length=num_steps)

    # Warmup/compile.
    states, _ = run(states)
    jax.block_until_ready(states)

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        states, metrics = run(states)
    jax.block_until_ready(states)
    dt = time.perf_counter() - t0

    env_steps_per_sec = num_envs * num_steps * reps / dt
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_4agent_noncoop",
                "value": round(env_steps_per_sec, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(env_steps_per_sec / REFERENCE_CPU_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
