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

    cfg = EnvConfig(dtype="float64", rvo_collab_coeff=-0.5)
    # head-on pair: an egoistic (coeff 0) agent keeps its preferred velocity
    state = init_state(
        cfg,
        pos=np.array([[-2.0, 0.0], [2.0, 0.0]]),
        goal=np.array([[2.0, 0.0], [-2.0, 0.0]]),
        radius=np.array([0.4, 0.4]),
        pref_speed=np.array([1.0, 1.0]),
        rng=jax.random.PRNGKey(0),
    )
    state = state.replace(vel=jnp.asarray([[1.0, 0.0], [-1.0, 0.0]]))
    # over many keys, both egoistic and collaborative behavior appear
    deviations = []
    for k in range(16):
        st = state.replace(rng=jax.random.PRNGKey(k))
        act = np.asarray(rvo_policy.rvo_kernel(st, cfg, None))
        deviations.append(abs(act[0, 1]))
    deviations = np.array(deviations)
    assert (deviations < 1e-9).any(), "some keys should be egoistic (straight)"
    assert (deviations > 1e-6).any(), "some keys should be collaborative (deviate)"
