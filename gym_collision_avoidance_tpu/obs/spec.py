"""Declarative observation assembly.

The reference declares the obs layout as config-held attr-accessor strings
evaluated with ``eval`` per agent per step
(``envs/config.py:93-170`` + ``envs/agent.py:323-327``).  Here each obs key
maps to a pure function of the already-updated :class:`EnvState`, evaluated
for the whole agent batch at once; the result is a dict-of-arrays pytree
with leading ``[A]`` axis.

Default active keys mirror ``Config.STATES_IN_OBS``
(``envs/config.py:179``):
``['is_learning', 'num_other_agents', 'dist_to_goal', 'heading_ego_frame',
'pref_speed', 'radius', 'other_agents_states']``.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gym_collision_avoidance_tpu.policies import registry as policies

DEFAULT_STATES_IN_OBS: Tuple[str, ...] = (
    "is_learning",
    "num_other_agents",
    "dist_to_goal",
    "heading_ego_frame",
    "pref_speed",
    "radius",
    "other_agents_states",
)

# States fed to the GA3C network = STATES_IN_OBS minus
# STATES_NOT_USED_IN_POLICY (= ['is_learning'], envs/config.py:183-184).
DEFAULT_STATES_NOT_USED_IN_POLICY: Tuple[str, ...] = ("is_learning",)


def _is_learning(state, cfg, sensed):
    mask = policies._isin(state.policy_id, policies.LEARNING_POLICIES)
    return mask.astype(state.pos.dtype)[:, None]


_OBS_FNS: Dict[str, Callable] = {
    # key -> (state, cfg, sensed) -> [A, ...] array
    "is_learning": _is_learning,
    "num_other_agents": lambda s, c, sensed: s.num_other_agents_observed.astype(s.pos.dtype)[:, None],
    "dist_to_goal": lambda s, c, sensed: s.dist_to_goal[:, None],
    "heading_ego_frame": lambda s, c, sensed: s.heading_ego_frame[:, None],
    "pref_speed": lambda s, c, sensed: s.pref_speed[:, None],
    "radius": lambda s, c, sensed: s.radius[:, None],
    "other_agent_states": lambda s, c, sensed: s.other_agent_states,
    "other_agents_states": lambda s, c, sensed: sensed["other_agents_states"],
    "laserscan": lambda s, c, sensed: sensed["laserscan"],
}

# Normalization statistics (envs/config.py:93-170 'mean'/'std' entries),
# used by learning pipelines; per scalar key: (mean, std).
NORM_STATS = {
    "dist_to_goal": (0.0, 5.0),
    "radius": (0.5, 1.0),
    "heading_ego_frame": (0.0, 3.14),
    "pref_speed": (1.0, 1.0),
    "num_other_agents": (1.0, 1.0),
    "other_agent_states": (
        np.array([0.0, 0.0, 0.0, 0.0, 0.5, 0.0, 1.0], np.float32),
        np.array([5.0, 5.0, 1.0, 1.0, 1.0, 5.0, 1.0], np.float32),
    ),
    "other_agents_states": (
        np.array([0.0, 0.0, 0.0, 0.0, 0.5, 0.0, 1.0], np.float32),
        np.array([5.0, 5.0, 1.0, 1.0, 1.0, 5.0, 1.0], np.float32),
    ),
    "laserscan": (5.0, 5.0),
}


def build_observation(state, cfg, sensed, states_in_obs: Sequence[str] = DEFAULT_STATES_IN_OBS):
    """Assemble the dict observation for every agent at once.

    Args:
        sensed: dict of raw sensor outputs, e.g.
            {'other_agents_states': [A, K, 7], 'laserscan': [A, P, L]}.

    Returns:
        dict key -> [A, ...] array (sim dtype; the reference computes these
        in float64 and casts at network input, GA3C_CADRL/network.py:41).
    """
    obs = {}
    for key in states_in_obs:
        obs[key] = _OBS_FNS[key](state, cfg, sensed)
    return obs


def flatten_policy_obs(obs: Dict[str, jax.Array], states_in_obs=DEFAULT_STATES_IN_OBS,
                       states_not_used=DEFAULT_STATES_NOT_USED_IN_POLICY):
    """Flatten the dict obs into the vector a network policy consumes.

    Mirrors GA3CCADRLPolicy.find_next_action's hstack over STATES_IN_OBS
    minus STATES_NOT_USED_IN_POLICY (envs/policies/GA3CCADRLPolicy.py:68-74).

    Returns:
        [A, total_len] array.
    """
    parts = []
    for key in states_in_obs:
        if key in states_not_used:
            continue
        arr = obs[key]
        parts.append(arr.reshape(arr.shape[0], -1))
    return jnp.concatenate(parts, axis=-1)
