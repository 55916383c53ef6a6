"""Scenario definitions (layer L5 of the reference).

A Scenario is plain host-side data: arrays of
``[px, py, gx, gy, pref_speed, radius]`` plus per-agent policy/dynamics ids
and optional headings — the same 6-tuple format the reference's pickled
test suites use (``envs/test_cases.py:495-590``).  ``to_state`` turns it
into a device :class:`EnvState`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

from gym_collision_avoidance_tpu.config import EnvConfig
from gym_collision_avoidance_tpu.core import dynamics as dyn
from gym_collision_avoidance_tpu.core.state import init_state
from gym_collision_avoidance_tpu.policies import registry as policies


@dataclasses.dataclass
class Scenario:
    """Host-side description of one episode's initial conditions."""

    pos: np.ndarray          # [A, 2]
    goal: np.ndarray         # [A, 2]
    pref_speed: np.ndarray   # [A]
    radius: np.ndarray       # [A]
    heading: Optional[np.ndarray] = None  # [A]; NaN entries -> toward goal
    policy_id: Optional[np.ndarray] = None
    dynamics_id: Optional[np.ndarray] = None
    valid: Optional[np.ndarray] = None

    @property
    def num_agents(self) -> int:
        return self.pos.shape[0]

    @property
    def active_policies(self):
        pid = self.policy_id
        if pid is None:
            return (policies.NONCOOP,)
        return tuple(sorted(set(int(p) for p in np.asarray(pid))))

    def to_state(self, cfg: EnvConfig, rng=None):
        return init_state(
            cfg,
            pos=self.pos,
            goal=self.goal,
            radius=self.radius,
            pref_speed=self.pref_speed,
            heading=self.heading,
            policy_id=self.policy_id,
            dynamics_id=self.dynamics_id,
            valid=self.valid,
            rng=rng,
        )

    def pad_to(self, max_agents: int) -> "Scenario":
        """Pad with invalid agents so scenarios of different sizes share one
        compiled step (static shapes are the XLA idiom; the reference
        instead re-instantiates the env per agent count)."""
        A = self.num_agents
        if A == max_agents:
            return self
        pad = max_agents - A
        far = 1e4  # parked far away so they never interact

        def _pad(arr, fill):
            arr = np.asarray(arr)
            if arr is None:
                return None
            shape = (pad,) + arr.shape[1:]
            return np.concatenate([arr, np.full(shape, fill, arr.dtype)])

        heading = self.heading if self.heading is not None else np.full(A, np.nan)
        policy_id = (
            self.policy_id if self.policy_id is not None
            else np.full(A, policies.NONCOOP, np.int32)
        )
        dynamics_id = (
            self.dynamics_id if self.dynamics_id is not None
            else np.full(A, dyn.UNICYCLE, np.int32)
        )
        valid = self.valid if self.valid is not None else np.ones(A, bool)
        pos = _pad(self.pos, far)
        # Parked agents get a distinct far goal so dist-to-goal stays finite.
        goal = np.concatenate([np.asarray(self.goal), np.full((pad, 2), far + 1.0)])
        return Scenario(
            pos=pos,
            goal=goal,
            pref_speed=_pad(self.pref_speed, 1.0),
            radius=_pad(self.radius, 0.1),
            heading=_pad(heading, 0.0),
            policy_id=_pad(policy_id, policies.STATIC).astype(np.int32),
            dynamics_id=_pad(dynamics_id, dyn.EXTERNAL).astype(np.int32),
            valid=_pad(valid, False).astype(bool),
        )


def from_cadrl_case(
    case: np.ndarray,
    policy: str | Sequence[str] = "noncoop",
    dynamics: str = "unicycle",
    heading: Optional[np.ndarray] = None,
) -> Scenario:
    """Build a Scenario from a reference-format test case array
    ([A, 6] of [px, py, gx, gy, pref_speed, radius], envs/test_cases.py:9).

    In evaluate mode the reference points the initial heading at the goal
    (``cadrl_test_case_to_agents``, envs/test_cases.py:556-562), which is
    our default (heading=None -> NaN -> toward goal).
    """
    case = np.asarray(case, np.float64)
    A = case.shape[0]
    if isinstance(policy, str):
        pids = np.full(A, policies.POLICY_NAMES[policy], np.int32)
    else:
        pids = np.array([policies.POLICY_NAMES[p] for p in policy], np.int32)
    dids = np.full(A, dyn.DYNAMICS_NAMES[dynamics], np.int32)
    return Scenario(
        pos=case[:, 0:2],
        goal=case[:, 2:4],
        pref_speed=case[:, 4],
        radius=case[:, 5],
        heading=heading,
        policy_id=pids,
        dynamics_id=dids,
    )


def two_agents_swap(policy="noncoop") -> Scenario:
    """The `get_testcase_two_agents` geometry (envs/test_cases.py:144-175):
    (-3,-3)->(3,3) heading 0 and (3,3)->(-3,-3) heading pi, r=0.5, v=1."""
    case = np.array(
        [
            [-3.0, -3.0, 3.0, 3.0, 1.0, 0.5],
            [3.0, 3.0, -3.0, -3.0, 1.0, 0.5],
        ]
    )
    sc = from_cadrl_case(case, policy=policy)
    sc.heading = np.array([0.0, np.pi])
    return sc


def preset_two_agent_cases() -> list[np.ndarray]:
    """The hard-coded 2-agent small suite (envs/test_cases.py:637-700)."""
    s2 = 3.0 / 1.4
    return [
        np.array([[-3.0, 0.0, 3.0, 0.0, 1.0, 0.3], [3.0, 0.0, -3.0, 0.0, 1.0, 0.3]]),
        np.array([[-3.0, 0.0, 3.0, 0.0, 1.0, 0.3], [s2, -s2, -s2, s2, 1.0, 0.3]]),
        np.array([[-2.0, -1.5, 2.0, 1.5, 1.0, 0.5], [-2.0, 1.5, 2.0, -1.5, 1.0, 0.5]]),
        np.array([[-3.0, 0.0, 3.0, 0.0, 1.0, 0.5], [0.0, -3.0, 0.0, 3.0, 1.0, 0.5]]),
        np.array([[-2.5, 0.0, 2.5, 0.0, 1.0, 0.3], [2.5, 0.0, -2.5, 0.0, 0.8, 0.4]]),
        np.array([[-3.0, 0.0, 3.0, 0.0, 0.6, 0.5], [s2, -s2, -s2, s2, 1.0, 0.4]]),
    ]


def circle_scenario(num_agents: int, radius: float = None, agent_radius: float = 0.5,
                    pref_speed: float = 1.0, policy: str = "noncoop") -> Scenario:
    """Antipodal circle config (``gen_circle_test_case``,
    envs/test_cases.py:900-911): agents evenly spaced on a circle, goals
    diametrically opposite."""
    if radius is None:
        radius = max(2.0, num_agents * agent_radius)
    angles = 2 * np.pi * np.arange(num_agents) / num_agents
    pos = radius * np.stack([np.cos(angles), np.sin(angles)], axis=-1)
    goal = -pos
    case = np.concatenate(
        [
            pos,
            goal,
            np.full((num_agents, 1), pref_speed),
            np.full((num_agents, 1), agent_radius),
        ],
        axis=-1,
    )
    return from_cadrl_case(case, policy=policy)
