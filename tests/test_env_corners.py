"""Env-semantics corners: wiggly reward, single-agent done mode,
max-turn-rate dynamics, learning-policy action mapping vs reference."""

import numpy as np
import jax.numpy as jnp

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.core import dynamics as dyn
from gym_collision_avoidance_tpu.core.state import init_state
from gym_collision_avoidance_tpu.env.step import env_reset, env_step
from gym_collision_avoidance_tpu.policies import registry as P

from tests.oracle import refsim


def test_wiggly_behavior_penalty():
    cfg = EnvConfig(dtype="float64", wiggly_behavior_threshold=0.1,
                    reward_wiggly_behavior=-0.05, done_mode="evaluate")
    state = init_state(cfg, pos=np.array([[0.0, 0.0]]),
                       goal=np.array([[5.0, 0.0]]),
                       radius=np.array([0.3]), pref_speed=np.array([1.0]),
                       policy_id=np.array([P.EXTERNAL]))
    state, _ = env_reset(state, cfg)
    # big heading change -> wiggly penalty on top of base reward
    _, _, rew, _, _ = env_step(state, np.array([[1.0, 0.5]]), cfg, None,
                               (P.EXTERNAL,))
    np.testing.assert_allclose(float(rew[0]), cfg.reward_time_step - 0.05)
    # straight action -> no penalty
    state2 = init_state(cfg, pos=np.array([[0.0, 0.0]]),
                        goal=np.array([[5.0, 0.0]]),
                        radius=np.array([0.3]), pref_speed=np.array([1.0]),
                        policy_id=np.array([P.EXTERNAL]))
    state2, _ = env_reset(state2, cfg)
    _, _, rew2, _, _ = env_step(state2, np.array([[1.0, 0.0]]), cfg, None,
                                (P.EXTERNAL,))
    np.testing.assert_allclose(float(rew2[0]), cfg.reward_time_step)


def test_single_agent_done_mode():
    cfg = EnvConfig(dtype="float64", done_mode="single")
    state = init_state(cfg, pos=np.array([[-0.25, 0.0], [5.0, 5.0]]),
                       goal=np.array([[0.0, 0.0], [-5.0, -5.0]]),
                       radius=np.array([0.3, 0.3]),
                       pref_speed=np.array([1.0, 1.0]))
    state, _ = env_reset(state, cfg)
    # agent 0 reaches its goal within 2 steps -> game over even though
    # agent 1 is far from done (collision_avoidance_env.py:541-543)
    for _ in range(3):
        state, _, _, game_over, _ = env_step(state, None, cfg, None, (P.NONCOOP,))
        if bool(game_over):
            break
    assert bool(game_over)
    assert not bool(state.is_at_goal[1])


def test_max_turn_rate_dynamics_matches_reference():
    refsim.import_reference()
    from gym_collision_avoidance.envs.agent import Agent
    from gym_collision_avoidance.envs import test_cases as tc
    from gym_collision_avoidance.envs.dynamics.UnicycleDynamicsMaxTurnRate import (
        UnicycleDynamicsMaxTurnRate,
    )

    cfg = EnvConfig(dtype="float64")
    a = Agent(0.0, 0.0, 5.0, 5.0, 0.3, 1.0, 0.2, tc.policy_dict["external"],
              UnicycleDynamicsMaxTurnRate, [], 0)
    state = init_state(cfg, pos=np.array([[0.0, 0.0]]),
                       goal=np.array([[5.0, 5.0]]),
                       radius=np.array([0.3]), pref_speed=np.array([1.0]),
                       heading=np.array([0.2]),
                       policy_id=np.array([P.EXTERNAL]),
                       dynamics_id=np.array([dyn.UNICYCLE_MAX_TURN_RATE]))
    state, _ = env_reset(state, cfg)

    rng = np.random.RandomState(0)
    for _ in range(20):
        action = np.array([rng.uniform(0, 1.2), rng.uniform(-2.0, 2.0)])
        a.take_action(action.astype(np.float32), cfg.dt)
        state, _, _, _, _ = env_step(state, action[None], cfg, None,
                                     (P.EXTERNAL,))
        np.testing.assert_allclose(np.asarray(state.pos[0]),
                                   a.pos_global_frame, atol=2e-5)
        np.testing.assert_allclose(float(state.heading[0]),
                                   a.heading_global_frame, atol=2e-5)


def test_learning_ga3c_and_carrl_action_tables():
    cfg = EnvConfig(dtype="float64")
    state = init_state(cfg, pos=np.zeros((2, 2)),
                       goal=np.full((2, 2), 3.0),
                       radius=np.full(2, 0.3), pref_speed=np.array([0.8, 1.0]),
                       policy_id=np.array([P.LEARNING_GA3C, P.CARRL]))
    ext = np.array([[3.0, 0.0], [10.0, 0.0]])  # discrete indices in col 0
    mapped = np.asarray(P.map_external_actions(state, ext, cfg))
    ga3c_table = P.ga3c_actions_table()
    np.testing.assert_allclose(mapped[0], [0.8 * ga3c_table[3, 0], ga3c_table[3, 1]])
    carrl_table = P.carrl_actions_table()
    np.testing.assert_allclose(mapped[1], carrl_table[10])


def test_large_num_agents_sanity():
    # LargeNumAgents analog (envs/config.py:236): 40 agents step without
    # NaNs and the sensor count clips at K
    import jax.numpy as jnp

    from gym_collision_avoidance_tpu.env.step import env_reset, env_step
    from gym_collision_avoidance_tpu.scenarios import presets

    cfg = EnvConfig(dtype="float32", max_num_other_agents_observed=19)
    sc = presets.circle_scenario(40, radius=10.0, agent_radius=0.2)
    state, _ = env_reset(sc.to_state(cfg), cfg)
    p0 = np.asarray(state.pos)
    for _ in range(10):
        state, obs, rew, go, _i = env_step(
            state, None, cfg, None, sc.active_policies
        )
    assert np.isfinite(np.asarray(state.pos)).all()
    assert np.isfinite(np.asarray(rew)).all()
    assert (np.asarray(state.num_other_agents_observed) <= 19).all()
    assert np.linalg.norm(np.asarray(state.pos) - p0) > 1.0  # they moved


def test_gymapi_dt_override_scales_motion():
    from gym_collision_avoidance_tpu.env.gymapi import CollisionAvoidanceEnv
    from gym_collision_avoidance_tpu.scenarios import presets

    sc = presets.two_agents_swap()
    env = CollisionAvoidanceEnv(EnvConfig(dtype="float64"), scenario=sc)
    env.reset()
    p0 = np.asarray(env.state.pos).copy()
    env.step()                      # default dt = 0.2
    d_full = np.linalg.norm(np.asarray(env.state.pos) - p0)

    env.reset()
    p0 = np.asarray(env.state.pos).copy()
    env.step(dt=0.1)                # per-call override (half step)
    d_half = np.linalg.norm(np.asarray(env.state.pos) - p0)
    np.testing.assert_allclose(d_half, d_full / 2.0, rtol=1e-9)
