"""Property/fuzz golden tests: random HETEROGENEOUS scenarios must match
the reference simulator bit for bit.

Round 2 added per-agent policy mixes, per-agent dynamics selection and
per-agent sensor equipage, each golden-tested on fixed cases.  This
module fuzzes those heterogeneity surfaces jointly: seeded random
scenarios with random agent counts, random policy/dynamics mixes and
random geometry, stepped 50 steps in float64 strict-parity mode and
asserted with ``assert_array_equal`` (zero tolerance) against the
reference oracle (per-Agent wiring: envs/agent.py:31-33; random case
construction: envs/test_cases.py:89-96).

All scenarios are padded to 4 agents (``Scenario.pad_to``) so every seed
shares ONE compiled program — the padding itself is part of what's under
test (parked invalid agents must never perturb real ones).
"""

import numpy as np
import pytest

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.core import dynamics as dyn
from gym_collision_avoidance_tpu.env.step import env_reset
from gym_collision_avoidance_tpu.harness import runner
from gym_collision_avoidance_tpu.policies import registry as policies
from gym_collision_avoidance_tpu.scenarios import presets

from tests.oracle import refsim

PARITY_CFG = EnvConfig(dtype="float64", done_mode="learning", strict_parity=True)
MAX_A = 4          # reference default Config: MAX_NUM_AGENTS_IN_ENVIRONMENT=4
NUM_STEPS = 50
SEEDS = list(range(24))

_POLICY_NAMES = {policies.NONCOOP: "noncoop", policies.STATIC: "static"}


def _random_mix(seed):
    """One seeded random heterogeneous scenario description."""
    rng = np.random.RandomState(4000 + seed)
    A = int(rng.randint(2, MAX_A + 1))
    radius = rng.uniform(0.2, 0.5, A)
    pref_speed = rng.uniform(0.5, 1.2, A)
    heading = rng.uniform(-np.pi, np.pi, A)
    # rejection-sample starts so nobody begins in collision
    pos = np.zeros((A, 2))
    for i in range(A):
        while True:
            p = rng.uniform(-4.0, 4.0, 2)
            if all(
                np.linalg.norm(p - pos[j]) > radius[i] + radius[j] + 0.2
                for j in range(i)
            ):
                pos[i] = p
                break
    # The reference preallocates per-agent history as
    # int(1.2 * MAX_TIME_RATIO * (dist-0.2)/pref_speed / dt) rows
    # (envs/agent.py:100-117) and CRASHES if an episode outlives it, so
    # goals too close to starts are unrepresentable there (its own
    # generator enforces a min distance too).  Keep the buffer > NUM_STEPS.
    goal = np.zeros((A, 2))
    for i in range(A):
        min_dist = 0.2 + pref_speed[i] * (NUM_STEPS + 4) * 0.2 / 2.4
        while True:
            g = rng.uniform(-4.0, 4.0, 2)
            if np.linalg.norm(g - pos[i]) > min_dist:
                goal[i] = g
                break
    # random policy mix with at least one mover
    policy_id = rng.choice([policies.NONCOOP, policies.STATIC], A)
    policy_id[rng.randint(A)] = policies.NONCOOP
    dynamics_id = rng.choice([dyn.UNICYCLE, dyn.UNICYCLE_MAX_TURN_RATE], A)
    return pos, goal, radius, pref_speed, heading, policy_id, dynamics_id


def _ref_rollout(pos, goal, radius, pref_speed, heading, policy_id, dynamics_id):
    refsim.import_reference()
    from gym_collision_avoidance.envs import test_cases as tc
    from gym_collision_avoidance.envs.agent import Agent
    from gym_collision_avoidance.envs.collision_avoidance_env import (
        CollisionAvoidanceEnv,
    )
    from gym_collision_avoidance.envs.dynamics.UnicycleDynamics import (
        UnicycleDynamics,
    )
    from gym_collision_avoidance.envs.dynamics.UnicycleDynamicsMaxTurnRate import (
        UnicycleDynamicsMaxTurnRate,
    )

    dyn_classes = {
        dyn.UNICYCLE: UnicycleDynamics,
        dyn.UNICYCLE_MAX_TURN_RATE: UnicycleDynamicsMaxTurnRate,
    }
    env = CollisionAvoidanceEnv()
    agents = [
        Agent(
            pos[i, 0], pos[i, 1], goal[i, 0], goal[i, 1], radius[i],
            pref_speed[i],
            # np.float64 heading: a python float would demote the
            # reference trig chain to f32 (test_golden_vs_reference.py)
            np.float64(heading[i]),
            tc.policy_dict[_POLICY_NAMES[int(policy_id[i])]],
            dyn_classes[int(dynamics_id[i])],
            [tc.sensor_dict["other_agents_states"]], i,
        )
        for i in range(pos.shape[0])
    ]
    env.set_agents(agents)
    env.reset()
    return refsim.rollout(env, NUM_STEPS)


def _jax_rollout(pos, goal, radius, pref_speed, heading, policy_id, dynamics_id):
    sc = presets.Scenario(
        pos=pos, goal=goal, pref_speed=pref_speed, radius=radius,
        heading=heading, policy_id=policy_id.astype(np.int32),
        dynamics_id=dynamics_id.astype(np.int32),
    ).pad_to(MAX_A)
    state = sc.to_state(PARITY_CFG)
    state, _ = env_reset(state, PARITY_CFG)
    # fixed policy set -> one compiled program across all fuzz seeds
    _, traj = runner.rollout(
        state, PARITY_CFG, NUM_STEPS,
        active_policies=(policies.STATIC, policies.NONCOOP),
        collect_obs=True,
    )
    return {
        k: np.asarray(v) if k != "obs"
        else {kk: np.asarray(vv) for kk, vv in v.items()}
        for k, v in traj.items()
    }


@pytest.mark.parametrize("seed", SEEDS)
def test_random_heterogeneous_mix_matches_reference(seed):
    mix = _random_mix(seed)
    A = mix[0].shape[0]
    ref = _ref_rollout(*mix)
    traj = _jax_rollout(*mix)

    for key in ("pos", "vel", "heading", "rewards", "is_at_goal",
                "in_collision", "ran_out_of_time"):
        np.testing.assert_array_equal(traj[key][:, :A], ref[key], err_msg=key)

    # observation parity for every real agent at every step (the sensor
    # pipeline must ignore the parked padding agents entirely)
    obs = traj["obs"]
    for t in range(NUM_STEPS):
        for i in range(A):
            np.testing.assert_array_equal(
                obs["dist_to_goal"][t, i], ref["obs"][t][i]["dist_to_goal"]
            )
            np.testing.assert_array_equal(
                obs["heading_ego_frame"][t, i],
                ref["obs"][t][i]["heading_ego_frame"],
            )
            np.testing.assert_allclose(
                obs["other_agents_states"][t, i],
                ref["obs"][t][i]["other_agents_states"], atol=1e-14,
            )
