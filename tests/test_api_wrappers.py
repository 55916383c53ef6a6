"""Gym API front end, obs wrappers, and in-graph auto-reset."""

import numpy as np
import jax
import jax.numpy as jnp

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.env import autoreset
from gym_collision_avoidance_tpu.env.gymapi import CollisionAvoidanceEnv
from gym_collision_avoidance_tpu.obs.wrappers import ObsLayout
from gym_collision_avoidance_tpu.policies import registry as P
from gym_collision_avoidance_tpu.scenarios import presets, random_cases


def test_gym_api_roundtrip():
    env = CollisionAvoidanceEnv(cfg=EnvConfig.evaluate(dtype="float32"))
    env.set_scenario(presets.two_agents_swap())
    obs, info = env.reset()
    assert set(obs) == {0, 1}
    assert "dist_to_goal" in obs[0]
    terminated = False
    steps = 0
    while not terminated and steps < 200:
        obs, rew, terminated, truncated, info = env.step(None)
        steps += 1
    assert terminated
    assert rew.shape == (2,)
    views = env.agents
    assert views[0].in_collision or views[0].is_at_goal


def test_gym_api_external_actions_dict():
    env = CollisionAvoidanceEnv(cfg=EnvConfig(dtype="float32"))
    sc = presets.two_agents_swap()
    sc.policy_id = np.array([P.LEARNING, P.NONCOOP])
    env.set_scenario(sc)
    env.reset()
    obs, rew, term, trunc, info = env.step({0: [1.0, 0.5]})
    assert info["which_agents_learning"][0]
    assert not info["which_agents_learning"][1]


def test_obs_layout_roundtrip():
    env = CollisionAvoidanceEnv(cfg=EnvConfig.evaluate(dtype="float32"))
    env.set_scenario(presets.circle_scenario(4, radius=3.0))
    env.reset()
    from gym_collision_avoidance_tpu.env.step import env_reset

    state = presets.circle_scenario(4, radius=3.0).to_state(env.cfg)
    state, obs = env_reset(state, env.cfg)
    layout = ObsLayout.from_obs(obs, list(obs))
    arr = layout.to_array(obs)
    assert arr.shape == (4, layout.agent_size)
    flat = layout.to_flat(obs)
    assert flat.shape == (4 * layout.agent_size,)
    back = layout.to_dict(arr)
    for k in obs:
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(obs[k]))


def test_autoreset_cycles_scenarios():
    cfg = EnvConfig(dtype="float32", done_mode="evaluate", max_time_ratio=1.2)
    pool = random_cases.scenario_pool(6, 2, seed=0, side_length=3.0)
    pool = jnp.asarray(pool, jnp.float32)
    policy_id = np.full(2, P.NONCOOP, np.int32)
    step = autoreset.make_autoreset_step(cfg, pool, policy_id)

    state = autoreset.state_from_case(cfg, pool[0], policy_id)
    from gym_collision_avoidance_tpu.env.step import env_reset

    state, _ = env_reset(state, cfg)
    counter = jnp.asarray(0, jnp.int32)
    jit_step = jax.jit(step)
    n_resets = 0
    for _ in range(400):
        state, counter, obs, rew, game_over = jit_step(state, counter)
        if bool(game_over):
            n_resets += 1
    assert n_resets >= 2
    assert int(counter) == n_resets
    # state after reset corresponds to a fresh pool entry
    assert not bool(jnp.any(state.in_collision)) or bool(jnp.any(state.valid))


def test_autoreset_batched_vmap():
    cfg = EnvConfig(dtype="float32", done_mode="evaluate", max_time_ratio=1.2)
    pool = jnp.asarray(random_cases.scenario_pool(8, 2, seed=3, side_length=3.0), jnp.float32)
    policy_id = np.full(2, P.NONCOOP, np.int32)
    step = autoreset.make_autoreset_step(cfg, pool, policy_id)

    E = 5
    states = jax.vmap(lambda i: autoreset.state_from_case(cfg, pool[i % 8], policy_id))(
        jnp.arange(E)
    )
    counters = jnp.arange(E, dtype=jnp.int32)

    @jax.jit
    def run(states, counters):
        def body(carry, _):
            st, c = carry
            st, c, obs, rew, go = jax.vmap(step)(st, c)
            return (st, c), go

        return jax.lax.scan(body, (states, counters), None, length=300)

    (states, counters), gos = run(states, counters)
    assert int(np.asarray(gos).sum()) >= E  # every env reset at least once
    assert np.all(np.asarray(counters) > np.arange(E))


def test_apply_external_states_matches_reference_set_state():
    from tests.oracle import refsim
    from gym_collision_avoidance_tpu.core import dynamics as dyn
    from gym_collision_avoidance_tpu.core.state import apply_external_states

    refsim.import_reference()
    from gym_collision_avoidance.envs.agent import Agent
    from gym_collision_avoidance.envs import test_cases as tc

    cfg = EnvConfig(dtype="float64")
    a = Agent(0.0, 0.0, 5.0, 5.0, 0.3, 1.0, 0.0, tc.policy_dict["external"],
              tc.dynamics_dict["external"], [], 0)
    sc = presets.Scenario(
        pos=np.array([[0.0, 0.0]]), goal=np.array([[5.0, 5.0]]),
        pref_speed=np.array([1.0]), radius=np.array([0.3]),
        heading=np.array([0.0]),
        policy_id=np.array([P.EXTERNAL]),
        dynamics_id=np.array([dyn.EXTERNAL]),
    )
    state = sc.to_state(cfg)

    # first injection: vel interpolation suppressed on step 0
    a.set_state(1.0, 0.5)
    state = apply_external_states(state, cfg, np.array([[1.0, 0.5]]))
    np.testing.assert_allclose(np.asarray(state.pos[0]), a.pos_global_frame)
    np.testing.assert_allclose(np.asarray(state.vel[0]), a.vel_global_frame)

    # later injection: velocity interpolated from position delta
    a.step_num = 1
    state = state.replace(step_num=jnp.ones(1, jnp.int32))
    a.set_state(1.4, 0.8)
    state = apply_external_states(state, cfg, np.array([[1.4, 0.8]]))
    np.testing.assert_allclose(np.asarray(state.pos[0]), a.pos_global_frame)
    np.testing.assert_allclose(np.asarray(state.vel[0]), a.vel_global_frame,
                               atol=1e-12)
    np.testing.assert_allclose(float(state.heading[0]), a.heading_global_frame,
                               atol=1e-12)


def test_gym_registration():
    import gymnasium
    from gym_collision_avoidance_tpu.env.gymapi import register_gym_env

    env_id = register_gym_env("CollisionAvoidanceTpu-test-v0")
    env = gymnasium.make(env_id, cfg=EnvConfig.evaluate(dtype="float32"))
    env.unwrapped.set_scenario(presets.two_agents_swap())
    obs, info = env.reset()
    assert 0 in obs


def test_default_gym_ids_registered_at_import():
    """Importing the package must register the reference-parity id
    CollisionAvoidance-v0 (reference registers it at import,
    gym_collision_avoidance/__init__.py:2-9)."""
    import gymnasium
    from gymnasium.envs.registration import registry

    import gym_collision_avoidance_tpu as pkg

    ids = ("CollisionAvoidance-v0", "CollisionAvoidanceTpu-v0")
    # The reference oracle (tests/oracle/refsim.py), if imported earlier in
    # the session, registers ITS CollisionAvoidance-v0 over ours; isolate by
    # re-running our import-time hook on a clean slate and restoring after.
    saved = {i: registry.pop(i, None) for i in ids}
    try:
        pkg._register_gym_ids()
        for env_id in ids:
            env = gymnasium.make(env_id, cfg=EnvConfig.evaluate(dtype="float32"))
            env.unwrapped.set_scenario(presets.two_agents_swap())
            obs, _ = env.reset()
            assert 0 in obs
    finally:
        for i, spec in saved.items():
            if spec is not None:
                registry[i] = spec


def test_set_static_map_loads_png_on_reset():
    """set_static_map parity (collision_avoidance_env.py:369-392): a PNG
    path set before reset becomes the episode's static map, and wall
    collisions are live."""
    from gym_collision_avoidance_tpu.env.gymapi import CollisionAvoidanceEnv

    cfg = EnvConfig(dtype="float32", use_static_map=True,
                    map_x_width=16.0, map_y_width=16.0)
    env = CollisionAvoidanceEnv(cfg=cfg)
    env.set_scenario(presets.two_agents_swap())
    png = "/root/reference/gym_collision_avoidance/envs/world_maps/002.png"
    env.set_static_map(png)
    env.reset()
    m = np.asarray(env.static_map)
    assert m.dtype == bool and m.any() and not m.all()
    # a list of candidates is also accepted (random choice per episode)
    env.set_static_map([png, png])
    env.reset()
    assert np.asarray(env.static_map).any()


def test_batched_env_step_matches_vmapped_env_step():
    """The batched fast path must equal vmap(env_step) exactly, for a
    mixed-policy batch including both NN policies."""
    import jax
    from gym_collision_avoidance_tpu.env.batch import batched_env_step
    from gym_collision_avoidance_tpu.env.step import env_reset, env_step
    from gym_collision_avoidance_tpu.models import cadrl as cadrl_net
    from gym_collision_avoidance_tpu.models import ga3c_cadrl

    cfg = EnvConfig(dtype="float64", done_mode="evaluate",
                    max_num_other_agents_observed=19,
                    agent_sorting_method="closest_last")
    params = {"cadrl": cadrl_net.load_params(),
              "ga3c_cadrl": ga3c_cadrl.load_params()}
    rng = np.random.RandomState(3)
    scenarios = []
    for _ in range(4):
        sc = presets.circle_scenario(4, radius=3.5, agent_radius=0.3)
        sc.pos = sc.pos + rng.uniform(-0.4, 0.4, sc.pos.shape)
        sc.heading = None
        sc.policy_id = np.array([P.CADRL, P.GA3C_CADRL, P.NONCOOP, P.STATIC])
        scenarios.append(sc)
    active = scenarios[0].active_policies

    states = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[sc.to_state(cfg) for sc in scenarios]
    )
    states = jax.vmap(lambda s: env_reset(s, cfg)[0])(states)

    ref_states = states
    for _ in range(5):
        states, obs_b, rew_b, go_b, _ = batched_env_step(
            states, None, cfg, params, active
        )
        ref_states, obs_v, rew_v, go_v, _ = jax.vmap(
            lambda s: env_step(s, None, cfg, params, active)
        )(ref_states)
        np.testing.assert_array_equal(np.asarray(states.pos), np.asarray(ref_states.pos))
        np.testing.assert_array_equal(np.asarray(rew_b), np.asarray(rew_v))
        np.testing.assert_array_equal(np.asarray(go_b), np.asarray(go_v))
        for k in obs_b:
            np.testing.assert_array_equal(np.asarray(obs_b[k]), np.asarray(obs_v[k]))


def test_mixed_density_pool_padding_inert():
    """scenario_pool_mixed: [A,7] rows whose invalid parked agents are
    bitwise inert — the 2-agent case stepped at its native size and inside
    a padded-to-4 mixed row produces identical real-agent trajectories."""
    cfg = EnvConfig(dtype="float32", done_mode="evaluate", max_time_ratio=1.2)
    mixed = random_cases.scenario_pool_mixed(4, [2, 4], seed=7, side_length=3.0)
    assert mixed.shape == (4, 4, 7)
    assert mixed[0, :, 6].tolist() == [1.0, 1.0, 0.0, 0.0]  # 2-agent row
    assert mixed[1, :, 6].tolist() == [1.0, 1.0, 1.0, 1.0]  # 4-agent row

    pid2 = np.full(2, P.NONCOOP, np.int32)
    pid4 = np.full(4, P.NONCOOP, np.int32)
    s4 = autoreset.state_from_case(cfg, jnp.asarray(mixed[0], jnp.float32), pid4)
    assert not bool(jnp.any(s4.valid[2:]))
    assert bool(jnp.all(s4.is_done[2:]))  # inert from t=0 (alive-mask zero)

    from gym_collision_avoidance_tpu.env.step import env_reset

    step2 = jax.jit(autoreset.make_autoreset_step(
        cfg, jnp.asarray(mixed[:, :2, :6], jnp.float32), pid2))
    step4 = jax.jit(autoreset.make_autoreset_step(
        cfg, jnp.asarray(mixed, jnp.float32), pid4))
    s2, _ = env_reset(autoreset.state_from_case(
        cfg, jnp.asarray(mixed[0, :2, :6], jnp.float32), pid2), cfg)
    s4, _ = env_reset(s4, cfg)
    c2 = c4 = jnp.asarray(0, jnp.int32)
    for _ in range(40):
        s2, c2, _, r2, over2 = step2(s2, c2)
        s4, c4, _, r4, over4 = step4(s4, c4)
        np.testing.assert_array_equal(np.asarray(s2.pos), np.asarray(s4.pos[:2]))
        np.testing.assert_array_equal(np.asarray(s2.vel), np.asarray(s4.vel[:2]))
        np.testing.assert_array_equal(np.asarray(r2), np.asarray(r4[:2]))
        assert bool(over2) == bool(over4)
        # Parked padding never moves and never collides.
        assert bool(jnp.all(s4.pos[2:, 0] > 1e3))
        assert not bool(jnp.any(s4.in_collision[2:]))
        if bool(over2):
            break  # pools diverge after the first in-graph reset


def test_ppo_trains_on_mixed_density_pool():
    """A PPO self-play train step over a mixed 2/4-density pool runs and
    yields finite losses (the --agents-mix path of scripts/train_ppo.py)."""
    from gym_collision_avoidance_tpu.train import PPOConfig, make_ppo

    pool = random_cases.scenario_pool_mixed(8, [2, 4], seed=1, side_length=3.0)
    ppo = PPOConfig(num_envs=8, horizon=8, num_agents=4, self_play=True,
                    policy_arch="ga3c", epochs=1, num_minibatches=1)
    train_step, init_fn, _ = make_ppo(ppo, pool=jnp.asarray(pool, jnp.float32))
    carry = init_fn(jax.random.PRNGKey(0))
    *carry, metrics = jax.jit(train_step)(*carry, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert bool(jnp.all(jnp.isfinite(jnp.asarray(v, jnp.float32)))), k
