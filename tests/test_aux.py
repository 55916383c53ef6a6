"""Aux subsystems: datasets, checkpointing, profiling, RVO anti-collab."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.env.step import env_reset, env_step
from gym_collision_avoidance_tpu.harness import datasets
from gym_collision_avoidance_tpu.scenarios import presets
from gym_collision_avoidance_tpu.utils import checkpoint, profiling


def test_cadrl_values_match_reference():
    from tests.oracle import refsim
    from gym_collision_avoidance_tpu.core import dynamics as dyn
    from gym_collision_avoidance_tpu.core.state import init_state
    from gym_collision_avoidance_tpu.models import cadrl as cadrl_net
    from gym_collision_avoidance_tpu.policies import cadrl as cadrl_policy

    refsim.import_reference()
    from gym_collision_avoidance.envs.agent import Agent
    from gym_collision_avoidance.envs import test_cases as tc

    cfg = EnvConfig(dtype="float64")
    rng = np.random.RandomState(11)
    A = 4
    pos = rng.uniform(-4, 4, (A, 2))
    goal = rng.uniform(-4, 4, (A, 2))
    radius = rng.uniform(0.2, 0.6, A)
    vel = rng.uniform(-1, 1, (A, 2))
    pref = rng.uniform(0.5, 1.5, A)

    state = init_state(cfg, pos=pos, goal=goal, radius=radius, pref_speed=pref)
    state = state.replace(vel=jnp.asarray(vel))
    rp, ro, d2g, he, ve = dyn.update_ego_frame(state.pos, state.goal, state.heading, state.vel)
    state = state.replace(ref_prll=rp, ref_orth=ro, dist_to_goal=d2g,
                          heading_ego_frame=he, vel_ego_frame=ve)

    agents = []
    for i in range(A):
        heading = np.arctan2(goal[i, 1] - pos[i, 1], goal[i, 0] - pos[i, 0])
        a = Agent(pos[i, 0], pos[i, 1], goal[i, 0], goal[i, 1], radius[i],
                  pref[i], heading, tc.policy_dict["CADRL"],
                  tc.dynamics_dict["unicycle"],
                  [tc.sensor_dict["other_agents_states"]], i)
        a.vel_global_frame = vel[i].astype(np.float64)
        a.dynamics_model.update_ego_frame()
        agents.append(a)

    params = {"cadrl": cadrl_net.load_params()}
    ours = np.asarray(cadrl_policy.cadrl_state_values(state, cfg, params))
    for i in range(A):
        _action, ref_value = agents[i].policy.find_next_action_and_value(
            None, agents, i
        )
        np.testing.assert_allclose(ours[i], float(ref_value), atol=1e-8)


def test_collect_regression_dataset():
    S, A_, V = datasets.collect_regression_dataset(60, num_agents=4, seed=0)
    assert S.shape == (60, 4 + 1 + 3 * 7)  # num,dist,heading,pref,radius + 3x7
    assert A_.shape == (60, 2)
    assert V.shape == (60, 1)
    assert np.isfinite(S).all() and np.isfinite(V).all()
    assert (V >= -0.26).all() and (V <= 1.0).all()


def test_collect_trajectory_dataset():
    trajs = datasets.collect_trajectory_dataset(num_trajs=2, seed=1)
    assert len(trajs) == 2
    d = trajs[0][0]
    assert set(d) == {"control_command", "predicted_cmd", "future_positions",
                      "pedestrian_state", "robot_state", "goal_position"}
    assert d["future_positions"].shape[1] == 2


def test_checkpoint_roundtrip(tmp_path):
    cfg = EnvConfig.evaluate(dtype="float32")
    sc = presets.circle_scenario(4, radius=3.0)
    state, _ = env_reset(sc.to_state(cfg), cfg)
    for _ in range(5):
        state, *_ = env_step(state, None, cfg, None, sc.active_policies)
    p = checkpoint.save_state(str(tmp_path / "ck.npz"), state)
    restored = checkpoint.load_state(p, state)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state, restored,
    )
    # resumed stepping continues identically
    s1, *_ = env_step(state, None, cfg, None, sc.active_policies)
    s2, *_ = env_step(restored, None, cfg, None, sc.active_policies)
    np.testing.assert_array_equal(np.asarray(s1.pos), np.asarray(s2.pos))


def test_checkpoint_rejects_mismatched_structure(tmp_path):
    """load_state must refuse a checkpoint whose pytree structure differs
    from ``like`` instead of silently misassigning leaves."""
    import pytest

    cfg = EnvConfig.evaluate(dtype="float32")
    sc = presets.circle_scenario(4, radius=3.0)
    state, _ = env_reset(sc.to_state(cfg), cfg)
    p = checkpoint.save_state(str(tmp_path / "ck.npz"), state)

    # a plain-dict pytree with the same leaf count but different structure
    leaves = jax.tree.leaves(state)
    fake = {f"k{i}": l for i, l in enumerate(leaves)}
    with pytest.raises(ValueError, match="different EnvState structure"):
        checkpoint.load_state(p, fake)


def test_profiling_time_step_fn():
    cfg = EnvConfig.evaluate(dtype="float32")
    sc = presets.circle_scenario(4, radius=3.0)
    state, _ = env_reset(sc.to_state(cfg), cfg)

    @jax.jit
    def step(s):
        return env_step(s, None, cfg, None, sc.active_policies)

    res = profiling.time_step_fn(step, state, warmup=1, iters=3)
    assert res["steps_per_s"] > 0


def test_rvo_anti_collab_mode():
    from gym_collision_avoidance_tpu.policies import rvo as rvo_policy
    from gym_collision_avoidance_tpu.core.state import init_state

    # close, offset pair with zero current velocity: the ORCA constraint
    # binds, so egoistic (coeff 0) and adversarial (coeff -0.5) draws give
    # DIFFERENT actions (verified against the C++ oracle: with a feasible
    # pref velocity, a negative coefficient steers toward the other agent).
    def mk(coeff):
        cfg = EnvConfig(dtype="float64", rvo_collab_coeff=coeff)
        state = init_state(
            cfg,
            pos=np.array([[-1.0, 0.0], [1.0, 0.3]]),
            goal=np.array([[2.0, 0.0], [-2.0, 0.3]]),
            radius=np.array([0.4, 0.4]),
            pref_speed=np.array([1.0, 1.0]),
            rng=jax.random.PRNGKey(0),
        )
        # below-pref current speed: the coeff-0 line (through the current
        # velocity) blocks the preferred velocity while the negative-coeff
        # line does not — the two draws give different actions
        state = state.replace(vel=jnp.asarray([[0.6, 0.0], [-0.6, 0.0]]))
        return cfg, state

    cfg0, state0 = mk(0.0)
    action_ego = np.asarray(rvo_policy.rvo_kernel(state0, cfg0, None))[0]

    cfg, state = mk(-0.5)
    acts = []
    for k in range(16):
        st = state.replace(rng=jax.random.PRNGKey(k))
        acts.append(tuple(np.round(
            np.asarray(rvo_policy.rvo_kernel(st, cfg, None))[0], 9)))
    distinct = set(acts)
    assert len(distinct) == 2, distinct
    assert tuple(np.round(action_ego, 9)) in distinct, (action_ego, distinct)


def test_rvo_anti_collab_host_stream_parity():
    """anti_collab_host_draws must consume the numpy stream exactly like
    the reference's per-agent RVOPolicy objects: agent-index order, only at
    window boundaries (reference rounding), skipping inactive agents."""
    from gym_collision_avoidance_tpu.policies import rvo as rvo_policy

    cfg = EnvConfig(dtype="float64", rvo_collab_coeff=-0.3,
                    rvo_anti_collab_t=1.0)
    A, steps = 3, 25

    # Independent mini-oracle: per-agent persistent flag objects driven by
    # the reference's exact boundary test (RVOPolicy.py:82-86) off one
    # shared stream.  Agent 1 is non-RVO throughout; agent 2 goes done at
    # step 12 (done agents are skipped, collision_avoidance_env.py:310-312).
    c = abs(cfg.rvo_collab_coeff)
    rng_ref = np.random.RandomState(1234)
    ref_flags = [True] * A
    ref_hist = []
    for s in range(steps):
        for a in range(A):
            if a == 1 or (a == 2 and s >= 12):
                continue
            t = s * cfg.dt
            rem = t % cfg.rvo_anti_collab_t
            if (round(rem, 3) < cfg.dt
                    or round(cfg.rvo_anti_collab_t - rem, 3) < cfg.dt):
                ref_flags[a] = bool(
                    rng_ref.choice([True, False], p=[1 - c, c]))
        ref_hist.append(list(ref_flags))

    rng = np.random.RandomState(1234)
    flags = np.ones(A, bool)
    for s in range(steps):
        active = np.array([True, False, s < 12])
        t = np.full(A, s * cfg.dt)
        flags = rvo_policy.anti_collab_host_draws(flags, t, active, cfg, rng)
        np.testing.assert_array_equal(flags[active], np.array(ref_hist[s])[active])
    # the two streams must be fully in sync at the end
    assert rng.randint(1 << 30) == rng_ref.randint(1 << 30)


def test_rvo_kernel_consumes_injected_flags():
    """params['rvo_use_noncoop'] overrides the stateless PRNG derivation:
    all-True flags reproduce the egoistic (coeff 0) action, all-False the
    adversarial (raw negative coeff) action."""
    from gym_collision_avoidance_tpu.core.state import init_state
    from gym_collision_avoidance_tpu.policies import rvo as rvo_policy

    def mk(coeff):
        cfg = EnvConfig(dtype="float64", rvo_collab_coeff=coeff)
        state = init_state(
            cfg,
            pos=np.array([[-1.0, 0.0], [1.0, 0.3]]),
            goal=np.array([[2.0, 0.0], [-2.0, 0.3]]),
            radius=np.array([0.4, 0.4]),
            pref_speed=np.array([1.0, 1.0]),
            rng=jax.random.PRNGKey(0),
        )
        return cfg, state.replace(vel=jnp.asarray([[0.6, 0.0], [-0.6, 0.0]]))

    cfg0, st0 = mk(0.0)
    ego = np.asarray(rvo_policy.rvo_kernel(st0, cfg0, None))
    cfg, st = mk(-0.5)
    out_true = np.asarray(rvo_policy.rvo_kernel(
        st, cfg, {rvo_policy.NONCOOP_FLAGS_KEY: np.array([True, True])}))
    np.testing.assert_array_equal(out_true, ego)
    out_false = np.asarray(rvo_policy.rvo_kernel(
        st, cfg, {rvo_policy.NONCOOP_FLAGS_KEY: np.array([False, False])}))
    assert not np.array_equal(out_false, ego)


def test_rvo_anti_collab_negative_coeff_matches_oracle():
    """The adversarial branch must use the RAW negative coefficient
    (RVOPolicy.py:88) — a negative reciprocity share steers INTO the
    collision cone, unlike +|c| which is ordinary cooperation."""
    from gym_collision_avoidance_tpu.ops import orca
    from gym_collision_avoidance_tpu.utils import native_build

    pos = np.array([[-2.0, 0.3], [2.0, 0.0]])
    vel = np.array([[1.0, 0.0], [-1.0, 0.0]])
    pref_vel = vel.copy()
    radius = np.array([0.4, 0.4])
    max_speed = np.array([1.2, 1.2])
    cpp = native_build.load_orca()
    for coeff in (-0.5, -1.0):
        ref = cpp(pos, vel, pref_vel, radius, max_speed,
                  np.array([coeff, 0.5]), 0.2, 1e6, 2, 5.0)
        ours = np.asarray(orca.orca_velocities(
            jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(pref_vel),
            jnp.asarray(radius), jnp.asarray(max_speed),
            jnp.asarray([coeff, 0.5]), jnp.ones(2, bool), 0.2, 1e6, 5.0))
        np.testing.assert_allclose(ours, ref, atol=1e-9)
        # adversarial deviates in the opposite lateral direction vs
        # cooperative
        coop = cpp(pos, vel, pref_vel, radius, max_speed,
                   np.array([abs(coeff), 0.5]), 0.2, 1e6, 2, 5.0)
        assert np.sign(ref[0, 1]) != np.sign(coop[0, 1]) or ref[0, 1] == 0


def test_autoreset_returns_fresh_obs_on_reset_steps():
    import jax
    from gym_collision_avoidance_tpu.env import autoreset
    from gym_collision_avoidance_tpu.env.step import env_reset
    from gym_collision_avoidance_tpu.scenarios import random_cases
    from gym_collision_avoidance_tpu.policies import registry as P

    cfg = EnvConfig(dtype="float32", done_mode="evaluate", max_time_ratio=1.2)
    pool = jnp.asarray(random_cases.scenario_pool(4, 2, seed=0, side_length=3.0),
                       jnp.float32)
    policy_id = np.full(2, P.NONCOOP, np.int32)
    step = jax.jit(autoreset.make_autoreset_step(cfg, pool, policy_id))
    state, _ = env_reset(autoreset.state_from_case(cfg, pool[0], policy_id), cfg)
    counter = jnp.asarray(0, jnp.int32)
    for _ in range(300):
        state, counter, obs, rew, game_over = step(state, counter)
        if bool(game_over):
            break
    assert bool(game_over)
    # returned obs must describe the FRESH state (dist_to_goal of the new
    # scenario, not ~0/terminal values of the finished one)
    np.testing.assert_allclose(
        np.asarray(obs["dist_to_goal"])[:, 0],
        np.asarray(state.dist_to_goal),
        atol=1e-6,
    )
    assert float(np.asarray(obs["dist_to_goal"]).min()) > 0.5


def test_autoreset_packed_select_bitwise_matches_per_leaf():
    """The packed [N, D] reset-select (one contraction for every varying
    leaf, env/autoreset.py:_pack_pool) must be bit-identical to the
    per-leaf one-hot contraction it replaced, across many reset events."""
    import jax
    from gym_collision_avoidance_tpu.env import autoreset
    from gym_collision_avoidance_tpu.env.step import env_reset
    from gym_collision_avoidance_tpu.scenarios import random_cases
    from gym_collision_avoidance_tpu.policies import registry as P

    cfg = EnvConfig(dtype="float32", done_mode="evaluate", max_time_ratio=1.2)
    pool = jnp.asarray(
        random_cases.scenario_pool(6, 2, seed=1, side_length=3.0), jnp.float32
    )
    policy_id = np.full(2, P.NONCOOP, np.int32)
    step_packed = jax.jit(
        jax.vmap(autoreset.make_autoreset_step(cfg, pool, policy_id, packed=True))
    )
    step_ref = jax.jit(
        jax.vmap(autoreset.make_autoreset_step(cfg, pool, policy_id, packed=False))
    )

    E = 4
    init = jax.vmap(
        lambda i: env_reset(
            autoreset.state_from_case(cfg, pool[i % 6], policy_id), cfg
        )[0]
    )(jnp.arange(E))
    counters = jnp.arange(E, dtype=jnp.int32)

    sa, ca = init, counters
    sb, cb = init, counters
    n_resets = 0
    for _ in range(250):
        sa, ca, oa, ra, ga = step_packed(sa, ca)
        sb, cb, ob, rb, gb = step_ref(sb, cb)
        n_resets += int(np.asarray(ga).sum())
        for la, lb in zip(jax.tree.leaves((sa, ca, oa, ra, ga)),
                          jax.tree.leaves((sb, cb, ob, rb, gb))):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    assert n_resets >= 2 * E  # the A/B actually exercised reset events


def test_autoreset_mxu_pick_bitwise_matches_masked_sum():
    """The MXU-dot reset-select for fat pool leaves (round 4,
    env/autoreset.py:pick) must be bit-identical to the masked mul+sum
    path across many reset events — the one-hot dot at
    Precision.HIGHEST has a single nonzero term, so ordering and the
    bf16x3 split cannot perturb the selected f32 values."""
    import jax
    from gym_collision_avoidance_tpu.env import autoreset
    from gym_collision_avoidance_tpu.env.step import env_reset
    from gym_collision_avoidance_tpu.scenarios import random_cases
    from gym_collision_avoidance_tpu.policies import registry as P

    cfg = EnvConfig(dtype="float32", done_mode="evaluate", max_time_ratio=1.2)
    pool = jnp.asarray(
        random_cases.scenario_pool(6, 2, seed=1, side_length=3.0), jnp.float32
    )
    policy_id = np.full(2, P.NONCOOP, np.int32)
    step_mxu = jax.jit(jax.vmap(
        autoreset.make_autoreset_step(cfg, pool, policy_id,
                                      mxu_pick_min_size=1)
    ))
    step_ref = jax.jit(jax.vmap(
        autoreset.make_autoreset_step(cfg, pool, policy_id,
                                      mxu_pick_min_size=1 << 30)
    ))

    E = 4
    init = jax.vmap(
        lambda i: env_reset(
            autoreset.state_from_case(cfg, pool[i % 6], policy_id), cfg
        )[0]
    )(jnp.arange(E))
    counters = jnp.arange(E, dtype=jnp.int32)

    sa, ca = init, counters
    sb, cb = init, counters
    n_resets = 0
    for _ in range(250):
        sa, ca, oa, ra, ga = step_mxu(sa, ca)
        sb, cb, ob, rb, gb = step_ref(sb, cb)
        n_resets += int(np.asarray(ga).sum())
        for la, lb in zip(jax.tree.leaves((sa, ca, oa, ra, ga)),
                          jax.tree.leaves((sb, cb, ob, rb, gb))):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    assert n_resets >= 2 * E
