"""Golden-test oracle: run the *reference* simulator on CPU.

The reference (/root/reference, read-only) depends on the legacy ``gym``
package which isn't installed; ``gymnasium`` is API-compatible for
everything the reference touches (Env, spaces.Box/Dict/Discrete), so we
shim it into ``sys.modules`` before importing the reference package.

Nothing in /root/reference is modified or copied — it is imported and
executed as-is to produce golden trajectories that the TPU-native engine
must match.
"""

from __future__ import annotations

import os
import sys

_REFERENCE_ROOT = "/root/reference"


def _install_gym_shim():
    if "gym" in sys.modules:
        return
    import gymnasium

    sys.modules["gym"] = gymnasium
    sys.modules["gym.spaces"] = gymnasium.spaces
    sys.modules["gym.envs"] = gymnasium.envs
    sys.modules["gym.envs.registration"] = gymnasium.envs.registration


def import_reference(config_class: str = "Config"):
    """Import the reference package with the given config class selected.

    NOTE: the reference binds its config singleton at import time
    (envs/__init__.py), so the first call wins for a given process unless
    modules are purged (reference tests do the same purge,
    gym_collision_avoidance/tests/test_collision_avoidance.py:10-18).
    """
    if not os.path.isdir(_REFERENCE_ROOT):  # e.g. CI without the mount
        import pytest

        pytest.skip("reference simulator not available at /root/reference",
                    allow_module_level=True)
    _install_gym_shim()
    # back the reference's RVOPolicy with the C++ ORCA oracle (its rvo2
    # submodule is not checked out in this image) — must be installed
    # before test_cases.py's optional RVO import runs
    from tests.oracle import rvo2_shim

    rvo2_shim.install()
    os.environ["GYM_CONFIG_CLASS"] = config_class
    if _REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, _REFERENCE_ROOT)
    import gym_collision_avoidance.envs as ref_envs  # noqa: F401

    return ref_envs


def purge_reference_modules():
    for name in list(sys.modules):
        if name.startswith("gym_collision_avoidance"):
            del sys.modules[name]


def make_two_agent_swap_env():
    """Reference env with the `get_testcase_two_agents` geometry but
    noncooperative policies (the PR1 golden scenario)."""
    import_reference()
    from gym_collision_avoidance.envs.collision_avoidance_env import (
        CollisionAvoidanceEnv,
    )
    from gym_collision_avoidance.envs.agent import Agent
    from gym_collision_avoidance.envs.policies.NonCooperativePolicy import (
        NonCooperativePolicy,
    )
    from gym_collision_avoidance.envs.dynamics.UnicycleDynamics import (
        UnicycleDynamics,
    )
    from gym_collision_avoidance.envs.sensors.OtherAgentsStatesSensor import (
        OtherAgentsStatesSensor,
    )
    import numpy as np

    env = CollisionAvoidanceEnv()
    agents = [
        # headings as np.float64 scalars: the reference's own agent
        # construction produces np.float64 headings (test_cases.py:555-559
        # via np.arctan2 / np.random.uniform).  Passing python floats here
        # would silently demote the whole heading/trig chain to float32
        # under NumPy-2 promotion (f32 action + weak python float -> f32).
        Agent(-3.0, -3.0, 3.0, 3.0, 0.5, 1.0, np.float64(0.0),
              NonCooperativePolicy, UnicycleDynamics,
              [OtherAgentsStatesSensor], 0),
        Agent(3.0, 3.0, -3.0, -3.0, 0.5, 1.0, np.float64(np.pi),
              NonCooperativePolicy, UnicycleDynamics,
              [OtherAgentsStatesSensor], 1),
    ]
    env.set_agents(agents)
    env.reset()
    return env


def make_env_from_case(case, policy_name="noncoop", sensors=("other_agents_states",),
                       sensors_per_agent=None):
    """Reference env from a [A, 6] case array of
    [px, py, gx, gy, pref_speed, radius]; headings point at the goal.

    ``sensors_per_agent``: optional list (len A) of per-agent sensor-name
    tuples, overriding the env-wide ``sensors`` (the reference attaches
    sensors per Agent, envs/agent.py:31-33)."""
    import_reference()
    import numpy as np
    from gym_collision_avoidance.envs.collision_avoidance_env import (
        CollisionAvoidanceEnv,
    )
    from gym_collision_avoidance.envs.agent import Agent
    from gym_collision_avoidance.envs import test_cases as tc

    env = CollisionAvoidanceEnv()
    agents = []
    for i, row in enumerate(np.asarray(case)):
        names = sensors if sensors_per_agent is None else sensors_per_agent[i]
        sensor_classes = [tc.sensor_dict[s] for s in names]
        px, py, gx, gy, v, r = row
        heading = np.arctan2(gy - py, gx - px)
        agents.append(
            Agent(px, py, gx, gy, r, v, heading, tc.policy_dict[policy_name],
                  tc.dynamics_dict["unicycle"], sensor_classes, i)
        )
    env.set_agents(agents)
    env.reset()
    return env


def rollout(env, num_steps):
    """Step the reference env, recording per-step state and outputs."""
    import numpy as np

    traj = {
        "pos": [], "vel": [], "heading": [], "rewards": [], "game_over": [],
        "is_at_goal": [], "in_collision": [], "ran_out_of_time": [],
        "obs": [],
    }
    for _ in range(num_steps):
        obs, rewards, game_over, _trunc, info = env.step(None)
        traj["pos"].append(np.array([a.pos_global_frame.copy() for a in env.agents]))
        traj["vel"].append(np.array([a.vel_global_frame.copy() for a in env.agents]))
        traj["heading"].append(np.array([a.heading_global_frame for a in env.agents]))
        traj["rewards"].append(np.array(rewards, dtype=np.float64))
        traj["game_over"].append(bool(game_over))
        traj["is_at_goal"].append(np.array([a.is_at_goal for a in env.agents]))
        traj["in_collision"].append(np.array([a.in_collision for a in env.agents]))
        traj["ran_out_of_time"].append(
            np.array([a.ran_out_of_time for a in env.agents])
        )
        # env.observation is mutated in place each step; snapshot it.
        import copy

        traj["obs"].append(copy.deepcopy(obs))
    for k in traj:
        if k != "obs":
            traj[k] = np.array(traj[k])
    return traj
