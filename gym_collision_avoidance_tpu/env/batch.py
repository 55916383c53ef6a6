"""Batched-env stepping: the production hot path.

``jax.vmap(env_step)`` is correct but turns every policy-network matmul
into E tiny batched dots (one [A, K] GEMM per env), which serializes the
MXU and costs ~100x for the NN policies.  :func:`batched_env_step` computes
actions ONCE over the whole [E, A] agent batch
(policies.compute_actions_batched — networks see a single [E*A, .] GEMM)
and only vmaps the cheap elementwise simulation step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gym_collision_avoidance_tpu.config import EnvConfig
from gym_collision_avoidance_tpu.env.step import env_step
from gym_collision_avoidance_tpu.obs import spec as obs_spec
from gym_collision_avoidance_tpu.policies import registry as policies


def batched_env_step(
    states,
    ext_actions,
    cfg: EnvConfig,
    params=None,
    active_policies: Tuple[int, ...] = (policies.NONCOOP,),
    sensors: Tuple[str, ...] = ("other_agents_states",),
    states_in_obs: Tuple[str, ...] = obs_spec.DEFAULT_STATES_IN_OBS,
    static_map=None,
    static_cells=None,
):
    """One lockstep step for an [E, A]-leaved state batch.

    Identical outputs to ``vmap(env_step)``; the policy networks run once
    over the flattened agent batch.  ``ext_actions`` is [E, A, 2] or None.
    """
    # StaticPolicy goal pin must precede action computation (idempotent with
    # the pin inside env_step).
    if policies.STATIC in active_policies:
        pin = (states.policy_id == policies.STATIC) & ~states.is_done
        states = states.replace(
            goal=jnp.where(pin[..., None], states.pos, states.goal)
        )

    actions = policies.compute_actions_batched(
        states, ext_actions, cfg, params, active_policies
    )

    def one(s, a):
        return env_step(
            s, None, cfg, params, active_policies, sensors, states_in_obs,
            static_map, static_cells, precomputed_actions=a,
        )

    return jax.vmap(one)(states, actions)
