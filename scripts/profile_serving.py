"""Trace + HLO-source attribution for the serving bench configs.

Usage: profile_serving.py {orca4,ga3c40,ga3c4,cadrl4} [E] [S]

Builds EXACTLY the loop the corresponding bench_all row times (orca4 /
ga3c4: in-graph autoreset serving; ga3c40: the fixed-scan LargeNumAgents
config), captures one dispatch under ``jax.profiler.trace``, and prints
the per-op / per-source-file device-time report
(``utils/traceattr.print_report``) plus the implied device ceiling.
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
from gym_collision_avoidance_tpu.scenarios import presets, random_cases
from gym_collision_avoidance_tpu.utils import traceattr


def build_autoreset(policy, E, S, cfg_kwargs=None, params=None):
    cfg = EnvConfig(dtype="float32", done_mode="evaluate",
                    **(cfg_kwargs or {}))
    pool = jnp.asarray(
        random_cases.scenario_pool(64, 4, seed=0, side_length=4.0),
        jnp.float32,
    )
    policy_id = np.full(4, policy, np.int32)
    astep = autoreset.make_autoreset_step(
        cfg, pool, policy_id, active_policies=(int(policy),), params=params
    )
    states = jax.vmap(
        lambda i: autoreset.state_from_case(cfg, pool[i % 64], policy_id)
    )(jnp.arange(E))

    def body(carry, _):
        st, c = carry
        st, c, obs, rew, go = jax.vmap(astep)(st, c)
        return (st, c), (jnp.mean(rew), jnp.sum(obs["dist_to_goal"]))

    @jax.jit
    def run(carry):
        return jax.lax.scan(body, carry, None, length=S)

    return run, (states, jnp.arange(E, dtype=jnp.int32))


def build_cadrl4(E, S):
    from gym_collision_avoidance_tpu.env.batch import batched_env_step
    from gym_collision_avoidance_tpu.models import cadrl as cadrl_net

    cfg = EnvConfig(dtype="float32")
    sc = presets.circle_scenario(4, radius=3.0, agent_radius=0.5,
                                 policy="CADRL")
    params = {"cadrl": cadrl_net.load_params(dtype=jnp.float32)}
    state = sc.to_state(cfg)
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (E,) + x.shape), state
    )

    def body(states, _):
        states, _o, rew, go, _i = batched_env_step(
            states, None, cfg, params, sc.active_policies,
            ("other_agents_states",), ("dist_to_goal",),
        )
        return states, (jnp.mean(rew), jnp.mean(go.astype(jnp.float32)))

    @jax.jit
    def run(states):
        return jax.lax.scan(body, states, None, length=S)

    return run, states


def build_ga3c40(E, S):
    from gym_collision_avoidance_tpu.env.batch import batched_env_step
    from gym_collision_avoidance_tpu.models import ga3c_cadrl

    cfg = EnvConfig(dtype="float32", max_num_other_agents_observed=19,
                    agent_sorting_method="closest_last")
    sc = presets.circle_scenario(40, radius=10.0, agent_radius=0.3,
                                 policy="GA3C_CADRL")
    params = {"ga3c_cadrl": ga3c_cadrl.load_params()}
    state = sc.to_state(cfg)
    states = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (E,) + x.shape), state
    )

    def body(states, _):
        states, _o, rew, go, _i = batched_env_step(
            states, None, cfg, params, sc.active_policies,
            ("other_agents_states",), ("dist_to_goal",),
        )
        return states, (jnp.mean(rew), jnp.mean(go.astype(jnp.float32)))

    @jax.jit
    def run(states):
        return jax.lax.scan(body, states, None, length=S)

    return run, states


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "orca4"
    if which == "orca4":
        E = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
        S = int(sys.argv[3]) if len(sys.argv) > 3 else 128
        run, carry = build_autoreset(P.RVO, E, S)
    elif which == "ga3c4":
        from gym_collision_avoidance_tpu.models import ga3c_cadrl

        E = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
        S = int(sys.argv[3]) if len(sys.argv) > 3 else 128
        run, carry = build_autoreset(
            P.GA3C_CADRL, E, S,
            cfg_kwargs=dict(max_num_other_agents_observed=19,
                            agent_sorting_method="closest_last"),
            params={"ga3c_cadrl": ga3c_cadrl.load_params()},
        )
    elif which == "cadrl4":
        E = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
        S = int(sys.argv[3]) if len(sys.argv) > 3 else 64
        run, carry = build_cadrl4(E, S)
    elif which == "ga3c40":
        E = int(sys.argv[2]) if len(sys.argv) > 2 else 256
        S = int(sys.argv[3]) if len(sys.argv) > 3 else 64
        run, carry = build_ga3c40(E, S)
    else:
        sys.exit(f"unknown config {which}")

    compiled = run.lower(carry).compile()
    hlo_text = compiled.as_text()
    out = run(carry)
    carry2 = out[0] if isinstance(out, tuple) and isinstance(out[0], tuple) else out[0]
    jax.block_until_ready(jax.tree.leaves(out)[0])

    outdir = f"/tmp/{which}_trace"
    with jax.profiler.trace(outdir):
        out = run(out[0])
        jax.block_until_ready(jax.tree.leaves(out)[0])

    t0 = time.perf_counter()
    out = run(out[0])
    jax.block_until_ready(jax.tree.leaves(out)[0])
    dt = time.perf_counter() - t0
    print(f"steady (single blocking dispatch): {E * S / dt:.1f} env-steps/s")
    traceattr.print_report(outdir, hlo_text, steps=S, envs=E)


if __name__ == "__main__":
    main()
