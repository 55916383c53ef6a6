"""Multi-config throughput benchmark (TPU or CPU).

Reports env-steps/s for the BASELINE.json config families and the
round-4 additions:
  - noncoop4 / autoreset4: 4-agent NonCoop (fixed scan / serving loop)
  - rvo4 / orca4: 4-agent ORCA-RVO (fixed-scan kernel A/B / the
    quotable steady-state serving row)
  - cadrl4: 4-agent SA-CADRL (47-action lookahead + value net)
  - ga3c4 / ga3c4_bf16 / ga3c4_serving: 4-agent GA3C-CADRL (LSTM)
  - ga3c20_laser: 20-agent GA3C + sparse laserscan + static map
  - ga3c40: the reference's LargeNumAgents regime (informational)
  - ppo_train: on-device PPO training throughput

Usage: python scripts/bench_all.py [--envs 4096] [--steps 128] [--cpu]
           [--configs name ...]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def bench_config(name, cfg, scenario, params, num_envs, num_steps,
                 static_map=None, sensors=("other_agents_states",),
                 static_cells=None, reps=3, pipeline=1):
    import jax
    import jax.numpy as jnp

    from gym_collision_avoidance_tpu.env.batch import batched_env_step

    state = scenario.to_state(cfg)
    states = jax.tree.map(lambda x: jnp.broadcast_to(x, (num_envs,) + x.shape), state)
    active = scenario.active_policies

    def body(states, _):
        states, _o, rew, go, info = batched_env_step(
            states, None, cfg, params, active, sensors, ("dist_to_goal",),
            static_map, static_cells,
        )
        # laserscan fast-path exactness guard: any True means the benched
        # trajectory left the regime where the windowed/wedge-culled path
        # is bit-identical — the run must fail, not publish a number for a
        # physically divergent simulation
        ovf = info.get("laserscan_exactness_overflow", jnp.asarray(False))
        return states, (jnp.mean(rew), jnp.mean(go.astype(jnp.float32)),
                        jnp.any(ovf))

    @jax.jit
    def run(states):
        return jax.lax.scan(body, states, None, length=num_steps)

    def check(metrics):
        if bool(jnp.any(metrics[2])):
            raise AssertionError(
                f"{name}: laserscan exactness overflow — the configured "
                "laserscan_entry_window/num_candidate_discs is too small "
                "for this trajectory; the bench would measure a divergent "
                "simulation")

    states, m = run(states)
    jax.block_until_ready(states)
    check(m)
    rates = []
    for _ in range(reps):
        # pipeline > 1: chain dispatches WITHOUT intermediate host syncs
        # (JAX async dispatch) so the per-dispatch host/tunnel overhead
        # overlaps device compute — how a serving consumer actually
        # drives the engine.  The timed work is identical; only the
        # pointless block between dispatches goes away.
        t0 = time.perf_counter()
        ms = []
        for _p in range(pipeline):
            states, m = run(states)
            ms.append(m)
        jax.block_until_ready(states)
        rates.append(
            pipeline * num_envs * num_steps / (time.perf_counter() - t0)
        )
        for m in ms:
            check(m)
    rates.sort()
    rate = rates[len(rates) // 2]
    agent_rate = rate * scenario.num_agents
    return {"config": name, "num_envs": num_envs,
            "env_steps_per_sec": round(rate, 1),
            "agent_steps_per_sec": round(agent_rate, 1),
            "spread_min": round(rates[0], 1),
            "spread_max": round(rates[-1], 1)}


def bench_noncoop4(E, S):
    from gym_collision_avoidance_tpu import EnvConfig
    from gym_collision_avoidance_tpu.scenarios import presets

    cfg = EnvConfig(dtype="float32")
    sc = presets.circle_scenario(4, radius=3.0, agent_radius=0.5)
    return bench_config("noncoop4", cfg, sc, None, E, S)


def bench_rvo4(E, S):
    from gym_collision_avoidance_tpu import EnvConfig
    from gym_collision_avoidance_tpu.scenarios import presets

    cfg = EnvConfig(dtype="float32")
    sc = presets.circle_scenario(4, radius=3.0, agent_radius=0.5, policy="RVO")
    return bench_config("rvo4", cfg, sc, None, E, S)


def bench_cadrl4(E, S):
    import jax.numpy as jnp

    from gym_collision_avoidance_tpu import EnvConfig
    from gym_collision_avoidance_tpu.models import cadrl as cadrl_net
    from gym_collision_avoidance_tpu.scenarios import presets

    cfg = EnvConfig(dtype="float32")
    sc = presets.circle_scenario(4, radius=3.0, agent_radius=0.5, policy="CADRL")
    params = {"cadrl": cadrl_net.load_params(dtype=jnp.float32)}
    # device-bound (S=128/S=1024 agree); pipeline=2 trims the residual
    # ~2% tunnel overhead of the 1.6 s dispatches
    return bench_config("cadrl4", cfg, sc, params, E // 4, S, pipeline=2)


def _ga3c4(E, S, name, dtype=None, pipeline=1):
    import jax.numpy as jnp

    from gym_collision_avoidance_tpu import EnvConfig
    from gym_collision_avoidance_tpu.models import ga3c_cadrl
    from gym_collision_avoidance_tpu.scenarios import presets

    cfg = EnvConfig(dtype="float32", max_num_other_agents_observed=19,
                    agent_sorting_method="closest_last")
    sc = presets.circle_scenario(4, radius=3.0, agent_radius=0.5,
                                 policy="GA3C_CADRL")
    kw = {} if dtype is None else {"dtype": getattr(jnp, dtype)}
    params = {"ga3c_cadrl": ga3c_cadrl.load_params(**kw)}
    return bench_config(name, cfg, sc, params, E // 4, S, pipeline=pipeline)


def bench_ga3c4(E, S):
    # pipeline=8: the round-3 trace put the DEVICE rate at ~11.8e6
    # (87 us/step) while the blocking-per-dispatch loop delivered 9.9e6 —
    # the missing 16% was the ~34 ms axon-tunnel dispatch overhead paid
    # serially per 212 ms dispatch.  Chaining dispatches per timed rep
    # overlaps that overhead with device compute: 1.088e7 at depth 4,
    # 1.115e7 at 8, 1.124e7 at 16 (diminishing; PERF.md round 4).
    return _ga3c4(E, S, "ga3c4", pipeline=8)


def bench_ga3c4_bf16(E, S):
    # bf16 serving fast path: matmul weights in bf16 (norm constants
    # stay f32; TPU MXU accumulates in f32).  NOT bit-identical to the
    # f32 path — >=98% action agreement (tests/test_ga3c.py); end-to-end
    # suite quality deltas recorded in RESULTS.md.  Same pipeline depth
    # as the f32 row so the comparison stays apples-to-apples.
    return _ga3c4(E, S, "ga3c4_bf16", dtype="bfloat16", pipeline=8)


def _autoreset_serving(name, policy, E, S, reps=3, pipeline=4):
    # steady-state "serving" loop: episodes reset in-graph from a
    # scenario pool, so throughput includes reset + fresh-obs cost and
    # every step advances a LIVE episode (no masked-but-finished compute
    # inflating the rate — the honest-number discipline of the headline)
    import jax as _jax
    import jax.numpy as jnp
    import numpy as np

    from gym_collision_avoidance_tpu import EnvConfig
    from gym_collision_avoidance_tpu.env import autoreset
    from gym_collision_avoidance_tpu.policies import registry as P
    from gym_collision_avoidance_tpu.scenarios import random_cases

    cfg = EnvConfig(dtype="float32", done_mode="evaluate")
    pool = jnp.asarray(
        random_cases.scenario_pool(64, 4, seed=0, side_length=4.0),
        jnp.float32,
    )
    policy_id = np.full(4, policy, np.int32)
    astep = autoreset.make_autoreset_step(
        cfg, pool, policy_id, active_policies=(int(policy),)
    )

    states = _jax.vmap(
        lambda i: autoreset.state_from_case(cfg, pool[i % 64], policy_id)
    )(jnp.arange(E))
    counters = jnp.arange(E, dtype=jnp.int32)

    def body(carry, _):
        st, c = carry
        st, c, obs, rew, go = _jax.vmap(astep)(st, c)
        return (st, c), (jnp.mean(rew), jnp.sum(obs["dist_to_goal"]))

    @_jax.jit
    def run(carry):
        return _jax.lax.scan(body, carry, None, length=S)

    carry = (states, counters)
    carry, _ = run(carry)
    _jax.block_until_ready(carry[0])
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _p in range(pipeline):
            carry, _m = run(carry)
        _jax.block_until_ready(carry[0])
        rates.append(pipeline * E * S / (time.perf_counter() - t0))
    rates.sort()
    # f32 NaN-freedom probe over the final serving states (free — no
    # extra compile): the round-4 ORCA f32 lesson (1e-300 guards
    # underflowing to 0/0=NaN) was visible only through a changed
    # episode count; this makes it driver-visible every bench run.
    nan_free = all(
        bool(jnp.all(jnp.isfinite(x)))
        for x in _jax.tree.leaves(carry[0])
        if jnp.issubdtype(x.dtype, jnp.floating)
    )
    return {"config": name, "num_envs": E,
            "env_steps_per_sec": round(rates[len(rates) // 2], 1),
            "spread_min": round(rates[0], 1),
            "spread_max": round(rates[-1], 1),
            "nan_free": nan_free,
            "episodes_completed": int(jnp.sum(carry[1] - jnp.arange(E)))}


def bench_autoreset4(E, S, reps=3):
    from gym_collision_avoidance_tpu.policies import registry as P

    return _autoreset_serving("autoreset4", P.NONCOOP, E, S, reps)


def bench_ga3c4_serving(E, S, reps=3):
    # GA3C-CADRL under the serving-loop discipline (in-graph autoreset,
    # every step a LIVE episode): the cross-check that the fixed-scan
    # ga3c4 row is not inflated by masked-but-done compute — the LSTM
    # runs identically for done agents, and this row confirms it
    # (1.143e7 live vs 1.11e7 fixed-scan, round 4).
    import jax as _jax
    import jax.numpy as jnp
    import numpy as np

    from gym_collision_avoidance_tpu import EnvConfig
    from gym_collision_avoidance_tpu.env import autoreset
    from gym_collision_avoidance_tpu.models import ga3c_cadrl
    from gym_collision_avoidance_tpu.policies import registry as P
    from gym_collision_avoidance_tpu.scenarios import random_cases

    E = E // 4
    cfg = EnvConfig(dtype="float32", done_mode="evaluate",
                    max_num_other_agents_observed=19,
                    agent_sorting_method="closest_last")
    pool = jnp.asarray(
        random_cases.scenario_pool(64, 4, seed=0, side_length=4.0),
        jnp.float32,
    )
    policy_id = np.full(4, P.GA3C_CADRL, np.int32)
    astep = autoreset.make_autoreset_step(
        cfg, pool, policy_id, active_policies=(int(P.GA3C_CADRL),),
        params={"ga3c_cadrl": ga3c_cadrl.load_params()},
    )
    states = _jax.vmap(
        lambda i: autoreset.state_from_case(cfg, pool[i % 64], policy_id)
    )(jnp.arange(E))

    def body(carry, _):
        st, c = carry
        st, c, obs, rew, go = _jax.vmap(astep)(st, c)
        return (st, c), (jnp.mean(rew), jnp.sum(obs["dist_to_goal"]))

    @_jax.jit
    def run(carry):
        return _jax.lax.scan(body, carry, None, length=S)

    carry = (states, jnp.arange(E, dtype=jnp.int32))
    carry, _ = run(carry)
    _jax.block_until_ready(carry[0])
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _p in range(8):
            carry, _m = run(carry)
        _jax.block_until_ready(carry[0])
        rates.append(8 * E * S / (time.perf_counter() - t0))
    rates.sort()
    return {"config": "ga3c4_serving", "num_envs": E,
            "env_steps_per_sec": round(rates[len(rates) // 2], 1),
            "spread_min": round(rates[0], 1),
            "spread_max": round(rates[-1], 1),
            "episodes_completed": int(jnp.sum(carry[1] - jnp.arange(E)))}


def bench_orca4(E, S, reps=3):
    # ORCA/RVO in the steady-state serving loop (private full-world sims,
    # half-planes + sequential 2-D LP every step, RVOPolicy.py:50-111
    # semantics).  This is the QUOTABLE ORCA number; the fixed-scenario
    # rvo4 row finishes its episodes early and then times frozen-state
    # compute (the "dispatch-bound" 2.0e9 artifact PERF.md used to
    # headline).
    from gym_collision_avoidance_tpu.policies import registry as P

    return _autoreset_serving("orca4", P.RVO, E, S, reps)


def bench_ppo_train(E, S, num_agents=2, arch="mlp"):
    # on-device PPO training throughput: rollout + GAE + 4 epochs of
    # minibatched updates per iteration, all in one jit.  env-steps/s
    # counts only ROLLOUT steps (the optimizer epochs are overhead on
    # top), so this is directly comparable to the serving rows.
    import jax as _jax

    from gym_collision_avoidance_tpu.train import PPOConfig, make_ppo

    ppo = PPOConfig(num_envs=min(E, 2048), horizon=64, num_agents=num_agents,
                    policy_arch=arch)
    train_step, init_fn, _ = make_ppo(ppo)
    step = _jax.jit(train_step)
    rng = _jax.random.PRNGKey(0)
    carry = list(init_fn(rng))
    rng, k = _jax.random.split(rng)
    *carry, m = step(*carry, k)
    _jax.block_until_ready(carry[0])
    reps = max(1, S // 64)
    # pipeline=16: chain train steps without per-step host syncs, as the
    # real training loop does (scripts/train_ppo.py only materializes
    # metrics every iters//20 iterations).  Blocking per step measured
    # 3.87e6 env-steps/s where the device can stream 1.42e7 — the
    # difference is the ~35 ms tunnel dispatch RTT, not device time.
    pipeline = 16
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _p in range(pipeline):
            rng, k = _jax.random.split(rng)
            *carry, m = step(*carry, k)
        _jax.block_until_ready(carry[0])
        rates.append(pipeline * ppo.num_envs * ppo.horizon
                     / (time.perf_counter() - t0))
    rates.sort()
    rate = rates[len(rates) // 2]
    name = "ppo_train" if arch == "mlp" else f"ppo_train_{arch}"
    return {"config": name, "num_envs": ppo.num_envs,
            "num_agents": num_agents,
            "env_steps_per_sec": round(rate, 1),
            "agent_steps_per_sec": round(rate * ppo.num_agents, 1),
            "spread_min": round(rates[0], 1),
            "spread_max": round(rates[-1], 1)}


def bench_ga3c20_laser(E, S):
    # laserscan_num_candidate_discs=10: per-beam-block disc culling,
    # bit-identical while wedge candidate counts stay <= 10 — this
    # scenario's trajectory peaks at 8 (validated in
    # tests/test_maps_sensors.py and obs.sensors.
    # laserscan_wedge_candidate_counts).
    import jax.numpy as jnp

    from gym_collision_avoidance_tpu import EnvConfig
    from gym_collision_avoidance_tpu.maps import grid as map_grid
    from gym_collision_avoidance_tpu.models import ga3c_cadrl
    from gym_collision_avoidance_tpu.scenarios import presets

    # laserscan_entry_window=12: per-(ego, source) first-two-hit windows
    # around each source's analytic entry sample (the trajectory's span
    # peaks at 12); laserscan_beam_slots=4: per-beam source compaction
    # (the trajectory's per-beam band-overlap count peaks at 4).  Both
    # conditionally exact; the in-graph exactness guard aborts the bench
    # on any violation (bench_config's check), so a --steps long enough
    # to leave the validated regime fails loudly instead of benching a
    # divergent simulation.  Round-4 A/B trail (ab_laser_r4.py):
    # 31.5k (full axis) -> 58.7k (W=14 r3) -> 92k (W=12, C=9, slots=4,
    # packed single-reduce compaction), all bitwise-identical.
    cfg = EnvConfig(dtype="float32", max_num_other_agents_observed=19,
                    agent_sorting_method="closest_last", use_static_map=True,
                    map_x_width=20.0, map_y_width=20.0,
                    laserscan_num_candidate_discs=9,
                    laserscan_entry_window=12,
                    laserscan_beam_slots=4)
    sc = presets.circle_scenario(20, radius=8.0, agent_radius=0.3,
                                 policy="GA3C_CADRL")
    params = {"ga3c_cadrl": ga3c_cadrl.load_params()}
    # natural (unpadded) cell list: an all-padding 64-row list costs
    # [E, A, L, R, 64] dead compares in the sparse laserscan
    static_np = map_grid.load_static_map(cfg, None)
    cells = jnp.asarray(map_grid.occupied_cell_list(static_np))
    # pipeline=4: +1.5% (111.1k -> 112.8k) — the 1.2 s dispatches pay
    # only ~3% tunnel overhead, most of it hidden by chaining
    return bench_config("ga3c20_laser", cfg, sc, params, E // 16, S,
                        static_cells=cells, pipeline=4,
                        sensors=("other_agents_states", "laserscan"))


def bench_ga3c40(E, S):
    # the reference's LargeNumAgents regime (envs/config.py:236-252: 40
    # agents, 19 observed): O(A^2) sensing + 19-slot LSTM per agent.
    # Informational row (not in the driver profile).  Official settings
    # (round 5): --envs 16384 --steps 256 => E=512, S=256, pipeline=4 —
    # the 64-step dispatches of earlier rounds paid ~13% dispatch
    # overhead at the post-lazy-x speed (3.52e5 at S=64/p2 vs 4.03e5 at
    # S=256/p4, 97% of the E=512 trace ceiling 4.15e5).
    import jax.numpy as jnp

    from gym_collision_avoidance_tpu import EnvConfig
    from gym_collision_avoidance_tpu.models import ga3c_cadrl
    from gym_collision_avoidance_tpu.scenarios import presets

    cfg = EnvConfig(dtype="float32", max_num_other_agents_observed=19,
                    agent_sorting_method="closest_last")
    sc = presets.circle_scenario(40, radius=10.0, agent_radius=0.3,
                                 policy="GA3C_CADRL")
    params = {"ga3c_cadrl": ga3c_cadrl.load_params()}
    return bench_config("ga3c40", cfg, sc, params, E // 32, S, pipeline=4)


CONFIGS = {
    "noncoop4": bench_noncoop4,
    "rvo4": bench_rvo4,
    "cadrl4": bench_cadrl4,
    "ga3c4": bench_ga3c4,
    "ga3c4_bf16": bench_ga3c4_bf16,
    "ga3c4_serving": bench_ga3c4_serving,
    "autoreset4": bench_autoreset4,
    "orca4": bench_orca4,
    "ppo_train": bench_ppo_train,
    "ga3c20_laser": bench_ga3c20_laser,
    "ga3c40": bench_ga3c40,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--configs", nargs="*", default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    results = []
    for name, fn in CONFIGS.items():
        if args.configs is not None and name not in args.configs:
            continue
        results.append(fn(args.envs, args.steps))
        print(json.dumps(results[-1]), flush=True)

    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
