"""Golden trajectory-equivalence tests vs the reference simulator.

The JAX engine runs in float64 strict-parity mode on CPU here and matches
the reference simulator BIT FOR BIT: positions, velocities, headings and
rewards are asserted with ``assert_array_equal`` (zero tolerance).

Two ingredients make this possible (see core/dynamics.py):
  * the oracle constructs reference Agents with np.float64 headings, the
    same type the reference's own agent factory produces
    (test_cases.py:555-559) — passing python floats would demote the
    reference's whole trig chain to float32 under NumPy-2 promotion;
  * strict-parity mode runs the dynamics step and ego-frame refresh on the
    host via numpy (XLA's CPU backend contracts a*b+c chains into FMAs and
    its atan2 is 1 ulp off libm on ~8% of inputs — both measured).
"""

import numpy as np
import pytest

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.harness import runner
from gym_collision_avoidance_tpu.policies import registry as policies
from gym_collision_avoidance_tpu.scenarios import presets

from tests.oracle import refsim

PARITY_CFG = EnvConfig(dtype="float64", done_mode="learning", strict_parity=True)


def _run_jax(scenario, num_steps, cfg=PARITY_CFG):
    state = scenario.to_state(cfg)
    from gym_collision_avoidance_tpu.env.step import env_reset

    state, _ = env_reset(state, cfg)
    final, traj = runner.rollout(
        state, cfg, num_steps, active_policies=scenario.active_policies
    )
    return final, {k: np.asarray(v) for k, v in traj.items()}


@pytest.fixture(scope="module")
def ref_swap_traj():
    env = refsim.make_two_agent_swap_env()
    return refsim.rollout(env, 80)


def test_two_agent_swap_trajectories_match(ref_swap_traj):
    sc = presets.two_agents_swap()
    _, traj = _run_jax(sc, 80)

    np.testing.assert_array_equal(traj["pos"], ref_swap_traj["pos"])
    np.testing.assert_array_equal(traj["vel"], ref_swap_traj["vel"])
    np.testing.assert_array_equal(traj["heading"], ref_swap_traj["heading"])
    np.testing.assert_array_equal(traj["rewards"], ref_swap_traj["rewards"])
    np.testing.assert_array_equal(traj["is_at_goal"], ref_swap_traj["is_at_goal"])
    np.testing.assert_array_equal(traj["in_collision"], ref_swap_traj["in_collision"])
    np.testing.assert_array_equal(
        traj["ran_out_of_time"], ref_swap_traj["ran_out_of_time"]
    )


def test_two_agent_swap_observations_match(ref_swap_traj):
    sc = presets.two_agents_swap()
    cfg = PARITY_CFG
    state = sc.to_state(cfg)
    from gym_collision_avoidance_tpu.env.step import env_reset

    state, _ = env_reset(state, cfg)
    _, traj = runner.rollout(
        state, cfg, 40, active_policies=sc.active_policies, collect_obs=True
    )
    obs = {k: np.asarray(v) for k, v in traj["obs"].items()}

    for t in range(40):
        ref_obs = ref_swap_traj["obs"][t]
        for i in range(2):
            np.testing.assert_array_equal(
                obs["dist_to_goal"][t, i], ref_obs[i]["dist_to_goal"]
            )
            np.testing.assert_array_equal(
                obs["heading_ego_frame"][t, i], ref_obs[i]["heading_ego_frame"]
            )
            np.testing.assert_allclose(
                obs["other_agents_states"][t, i],
                ref_obs[i]["other_agents_states"],
                atol=1e-14,
            )
            np.testing.assert_allclose(
                obs["num_other_agents"][t, i], ref_obs[i]["num_other_agents"]
            )


@pytest.mark.parametrize("case_idx", [0, 2, 3, 4])
def test_preset_two_agent_cases_match(case_idx):
    case = presets.preset_two_agent_cases()[case_idx]
    env = refsim.make_env_from_case(case)
    ref = refsim.rollout(env, 60)

    sc = presets.from_cadrl_case(case)
    _, traj = _run_jax(sc, 60)
    np.testing.assert_array_equal(traj["pos"], ref["pos"])
    np.testing.assert_array_equal(traj["rewards"], ref["rewards"])
    np.testing.assert_array_equal(traj["in_collision"], ref["in_collision"])


def test_circle_scenario_with_collisions_matches():
    # 4 noncoop agents crossing at the origin: exercises collision latching,
    # getting-close shaping, and freeze-on-done.
    sc = presets.circle_scenario(4, radius=3.0, agent_radius=0.5)
    case = np.concatenate(
        [sc.pos, sc.goal, sc.pref_speed[:, None], sc.radius[:, None]], axis=-1
    )
    env = refsim.make_env_from_case(case)
    ref = refsim.rollout(env, 60)

    _, traj = _run_jax(sc, 60)
    np.testing.assert_array_equal(traj["pos"], ref["pos"])
    np.testing.assert_array_equal(traj["rewards"], ref["rewards"])
    np.testing.assert_array_equal(traj["in_collision"], ref["in_collision"])
    np.testing.assert_array_equal(traj["is_at_goal"], ref["is_at_goal"])
    assert np.any(ref["in_collision"]), "scenario should produce collisions"


def test_static_agents_match_reference():
    # Mixed noncoop + static: exercises the StaticPolicy goal-pinning and
    # immediate at-goal reward semantics.
    refsim.import_reference()
    import numpy as np
    from gym_collision_avoidance.envs.collision_avoidance_env import (
        CollisionAvoidanceEnv,
    )
    from gym_collision_avoidance.envs.agent import Agent
    from gym_collision_avoidance.envs import test_cases as tc

    env = CollisionAvoidanceEnv()
    agents = [
        # np.float64 headings: python floats would demote the reference's
        # trig chain to f32 under NumPy-2 promotion (see module docstring)
        Agent(-3.0, 0.0, 3.0, 0.0, 0.5, 1.0, np.float64(0.0),
              tc.policy_dict["noncoop"], tc.dynamics_dict["unicycle"],
              [tc.sensor_dict["other_agents_states"]], 0),
        Agent(0.0, 0.05, 5.0, 5.0, 0.4, 1.0, np.float64(0.0),
              tc.policy_dict["static"], tc.dynamics_dict["unicycle"],
              [tc.sensor_dict["other_agents_states"]], 1),
    ]
    env.set_agents(agents)
    env.reset()
    ref = refsim.rollout(env, 50)

    sc = presets.Scenario(
        pos=np.array([[-3.0, 0.0], [0.0, 0.05]]),
        goal=np.array([[3.0, 0.0], [5.0, 5.0]]),
        pref_speed=np.array([1.0, 1.0]),
        radius=np.array([0.5, 0.4]),
        heading=np.array([0.0, 0.0]),
        policy_id=np.array([policies.NONCOOP, policies.STATIC]),
    )
    _, traj = _run_jax(sc, 50)
    np.testing.assert_array_equal(traj["pos"], ref["pos"])
    np.testing.assert_array_equal(traj["rewards"], ref["rewards"])
    np.testing.assert_array_equal(traj["in_collision"], ref["in_collision"])
    np.testing.assert_array_equal(traj["is_at_goal"], ref["is_at_goal"])
