"""SA-CADRL parity vs the reference legacy stack (value net + 47-action
lookahead + CADRLPolicy wrapper)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.core import dynamics as dyn
from gym_collision_avoidance_tpu.core.state import init_state
from gym_collision_avoidance_tpu.harness import runner
from gym_collision_avoidance_tpu.models import cadrl as cadrl_net
from gym_collision_avoidance_tpu.policies import cadrl as cadrl_policy
from gym_collision_avoidance_tpu.scenarios import presets

from tests.oracle import refsim


@pytest.fixture(scope="module")
def ref_value_net():
    refsim.import_reference()
    from gym_collision_avoidance.envs.policies.CADRL.scripts.multi import (
        nn_navigation_value_multi as nn_nav,
    )
    import os

    file_dir = (
        "/root/reference/gym_collision_avoidance/envs/policies/CADRL/scripts/multi"
    )
    return nn_nav.load_NN_navigation_value(
        file_dir, 4, "no_constr", "none",
        filename="4_agents_policy_iter_1000.p", ifPrint=False,
    )


def test_value_net_forward_matches(ref_value_net):
    rng = np.random.RandomState(3)
    x = rng.randn(50, 31) * 2.0
    x[:, 0] = rng.uniform(0, 30, 50)
    ref = ref_value_net.nn.make_prediction_raw(x).squeeze()
    ours = np.asarray(cadrl_net.forward_raw(cadrl_net.load_params(), jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_value_net_tpu_padded_forward_equivalent(ref_value_net):
    """load_params(tpu_pad=True) zero-pads to lane-aligned dims; outputs
    must match the unpadded forward to accumulation-order rounding (and the
    reference to the same 1e-10 as the unpadded path).  Measured on-TPU
    note: padding did NOT speed the CADRL step up (the step is not
    MLP-tiling-bound, PERF.md) — the option stays validated but off."""
    rng = np.random.RandomState(4)
    x = rng.randn(64, 31) * 2.0
    x[:, 0] = rng.uniform(0, 30, 64)
    ref = ref_value_net.nn.make_prediction_raw(x).squeeze()
    padded = np.asarray(
        cadrl_net.forward_raw(cadrl_net.load_params(tpu_pad=True), jnp.asarray(x))
    )
    unpadded = np.asarray(
        cadrl_net.forward_raw(cadrl_net.load_params(), jnp.asarray(x))
    )
    np.testing.assert_allclose(padded, unpadded, atol=1e-12)
    np.testing.assert_allclose(padded, ref, atol=1e-10)


def _random_env_state(rng, A, cfg):
    pos = rng.uniform(-4, 4, (A, 2))
    goal = rng.uniform(-4, 4, (A, 2))
    radius = rng.uniform(0.2, 0.6, A)
    vel = rng.uniform(-1.0, 1.0, (A, 2))
    past_vel = rng.uniform(-1.0, 1.0, (A, 2, 2))
    turning = rng.uniform(-1.0, 1.0, A)
    heading = rng.uniform(-np.pi, np.pi, A)
    state = init_state(
        cfg, pos=pos, goal=goal, radius=radius,
        pref_speed=rng.uniform(0.5, 1.5, A), heading=heading,
    )
    state = state.replace(
        vel=jnp.asarray(vel, state.pos.dtype),
        past_vel=jnp.asarray(past_vel, state.pos.dtype),
        turning_dir=jnp.asarray(turning, state.pos.dtype),
    )
    ref_prll, ref_orth, d2g, he, ve = dyn.update_ego_frame(
        state.pos, state.goal, state.heading, state.vel
    )
    return state.replace(ref_prll=ref_prll, ref_orth=ref_orth, dist_to_goal=d2g,
                         heading_ego_frame=he, vel_ego_frame=ve)


@pytest.mark.parametrize("A", [2, 3, 4, 6])
def test_lookahead_action_matches_reference(ref_value_net, A):
    """Our kernel vs the reference CADRLPolicy on random agent states."""
    refsim.import_reference()
    from gym_collision_avoidance.envs.agent import Agent
    from gym_collision_avoidance.envs import test_cases as tc

    cfg = EnvConfig(dtype="float64")
    rng = np.random.RandomState(100 + A)
    params = {"cadrl": cadrl_net.load_params()}

    n_match = 0
    for trial in range(6):
        state = _random_env_state(rng, A, cfg)

        # reference agents with identical state
        agents = []
        for i in range(A):
            a = Agent(
                float(state.pos[i, 0]), float(state.pos[i, 1]),
                float(state.goal[i, 0]), float(state.goal[i, 1]),
                float(state.radius[i]), float(state.pref_speed[i]),
                float(state.heading[i]), tc.policy_dict["CADRL"],
                tc.dynamics_dict["unicycle"],
                [tc.sensor_dict["other_agents_states"]], i,
            )
            a.vel_global_frame = np.asarray(state.vel[i]).astype(np.float64)
            a.past_global_velocities = np.asarray(state.past_vel[i]).astype(np.float64)
            a.turning_dir = float(state.turning_dir[i])
            a.dynamics_model.update_ego_frame()
            agents.append(a)

        ours = np.asarray(cadrl_policy.cadrl_kernel(state, cfg, params))
        for i in range(A):
            ref_action = agents[i].policy.find_next_action(None, agents, i)
            np.testing.assert_allclose(
                ours[i], np.asarray(ref_action), atol=1e-8,
                err_msg=f"A={A} trial={trial} agent={i}",
            )
            n_match += 1
    assert n_match == 6 * A


@pytest.fixture(scope="module")
def ref_rotate_net():
    """The rotate_constr_right net (CADRLPolicy.py:22, commented config):
    passing_side='right' activates find_bad_inds."""
    refsim.import_reference()
    from gym_collision_avoidance.envs.policies.CADRL.scripts.multi import (
        nn_navigation_value_multi as nn_nav,
    )

    file_dir = (
        "/root/reference/gym_collision_avoidance/envs/policies/CADRL/scripts/multi"
    )
    return nn_nav.load_NN_navigation_value(
        file_dir, 4, "rotate_constr", "right",
        filename="4_agents_policy_iter_1300.p", ifPrint=False,
    )


def test_rotate_net_forward_matches(ref_rotate_net):
    rng = np.random.RandomState(5)
    x = rng.randn(50, 31) * 2.0
    x[:, 0] = rng.uniform(0, 30, 50)
    ref = ref_rotate_net.nn.make_prediction_raw(x).squeeze()
    params = cadrl_net.load_params(cadrl_net.CHECKPOINTS["rotate_constr_right"])
    ours = np.asarray(cadrl_net.forward_raw(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-10)


@pytest.mark.parametrize("A", [2, 4])
def test_rotate_right_lookahead_matches_reference(ref_rotate_net, A):
    """Full 47-action lookahead parity with the passing-side cost active.
    The random states exercise find_bad_inds (verified below that at least
    one trial produces a nonzero passing-side penalty)."""
    refsim.import_reference()
    from gym_collision_avoidance.envs.agent import Agent
    from gym_collision_avoidance.envs import test_cases as tc

    cfg = EnvConfig(
        dtype="float64", cadrl_passing_side="right", cadrl_mode="rotate_constr"
    )
    rng = np.random.RandomState(200 + A)
    params = {
        "cadrl": cadrl_net.load_params(cadrl_net.CHECKPOINTS["rotate_constr_right"])
    }

    for trial in range(8):
        state = _random_env_state(rng, A, cfg)
        agents = []
        for i in range(A):
            a = Agent(
                float(state.pos[i, 0]), float(state.pos[i, 1]),
                float(state.goal[i, 0]), float(state.goal[i, 1]),
                float(state.radius[i]), float(state.pref_speed[i]),
                float(state.heading[i]), tc.policy_dict["CADRL"],
                tc.dynamics_dict["unicycle"],
                [tc.sensor_dict["other_agents_states"]], i,
            )
            a.vel_global_frame = np.asarray(state.vel[i]).astype(np.float64)
            a.past_global_velocities = np.asarray(state.past_vel[i]).astype(np.float64)
            a.turning_dir = float(state.turning_dir[i])
            a.dynamics_model.update_ego_frame()
            # each Agent instantiates its own CADRLPolicy: swap the value
            # net (and its passing_side) on this instance only
            a.policy.value_net = ref_rotate_net
            agents.append(a)

        ours = np.asarray(cadrl_policy.cadrl_kernel(state, cfg, params))
        for i in range(A):
            ref_action = agents[i].policy.find_next_action(None, agents, i)
            np.testing.assert_allclose(
                ours[i], np.asarray(ref_action), atol=1e-8,
                err_msg=f"A={A} trial={trial} agent={i}",
            )
    # (nonzero-penalty coverage is asserted in test_passing_side_cost_fires)


def test_passing_side_cost_fires(ref_rotate_net):
    """Construct a same-direction overtaking geometry where find_bad_inds
    must flag actions, and assert our penalty matches the reference's
    nonzero cost (not just zeros matching zeros)."""
    # ego at origin heading +x toward a far goal, slower other agent ahead
    # and slightly left -> 'right' rule penalizes passing on its left
    agent_state = np.array([0.0, 0.0, 1.2, 0.0, 0.0, 1.2, 10.0, 0.0, 0.3, 0.0])
    other_state = np.array([1.5, 0.6, 0.6, 0.0, 0.0, 0.6, 10.0, 0.6, 0.3, 0.0])
    other_action = np.array([0.6, 0.0])

    actions_theta = ref_rotate_net.find_feasible_actions(agent_state)
    dt_forward = 1.0
    ref_cost = ref_rotate_net.find_passing_side_cost(
        agent_state, actions_theta, [other_state], [other_action], dt_forward
    )
    assert np.any(ref_cost != 0.0), "geometry must trigger the penalty"

    # ours: same inputs through the batched pieces
    s10 = jnp.asarray(agent_state)
    others_s10 = jnp.zeros((3, 10)).at[0].set(jnp.asarray(other_state))
    others_act = jnp.zeros((3, 2)).at[0].set(jnp.asarray(other_action))
    present = jnp.array([True, False, False])
    at = jnp.asarray(actions_theta)
    agent_next = cadrl_policy._update_states(
        s10, (at[:, 0], at[:, 1]), dt_forward
    )
    others_next = cadrl_policy._update_states_others(
        others_s10, others_act, dt_forward
    )
    ours = np.asarray(
        cadrl_policy._passing_side_cost(
            s10, agent_next, others_s10, others_next, present, "right"
        )
    )
    np.testing.assert_allclose(ours, ref_cost, atol=1e-12)


def test_env_rollout_matches_reference(ref_value_net):
    sc0 = presets.circle_scenario(4, radius=4.0, agent_radius=0.3)
    case = np.concatenate(
        [sc0.pos, sc0.goal, sc0.pref_speed[:, None], sc0.radius[:, None]], -1
    )
    env = refsim.make_env_from_case(case, policy_name="CADRL")
    ref = refsim.rollout(env, 70)

    cfg = EnvConfig(dtype="float64", done_mode="learning")
    sc = presets.from_cadrl_case(case, policy="CADRL")
    state = sc.to_state(cfg)
    from gym_collision_avoidance_tpu.env.step import env_reset

    state, _ = env_reset(state, cfg)
    params = {"cadrl": cadrl_net.load_params()}
    _, traj = runner.rollout(
        state, cfg, 70, params=params, active_policies=sc.active_policies
    )
    np.testing.assert_allclose(np.asarray(traj["pos"]), ref["pos"], atol=5e-4)
    np.testing.assert_array_equal(np.asarray(traj["is_at_goal"]), ref["is_at_goal"])
    np.testing.assert_array_equal(np.asarray(traj["in_collision"]), ref["in_collision"])
