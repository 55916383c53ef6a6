"""In-graph episode auto-reset from a pre-generated scenario pool.

Replaces the reference's host-side per-episode reset (the unused
``DummyVecEnv`` reset-on-done loop, envs/vec_env.py:120-128) with a pure
in-graph select: when an env's episode is over, its whole state pytree is
swapped for a fresh state built from the next pool entry.  Scenario
generation is data-dependent rejection sampling, so pools are generated
host-side (:func:`scenarios.random_cases.scenario_pool`) and indexed with a
per-env counter on device (SURVEY.md §7.4 item 5).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gym_collision_avoidance_tpu.config import EnvConfig
from gym_collision_avoidance_tpu.core import maths
from gym_collision_avoidance_tpu.core.state import EnvState, init_state
from gym_collision_avoidance_tpu.env.step import env_step
from gym_collision_avoidance_tpu.obs import spec as obs_spec
from gym_collision_avoidance_tpu.policies import registry as policies


def state_from_case(cfg: EnvConfig, case, policy_id, dynamics_id=None, rng=None):
    """Jit-compatible state construction from a [A, 6] case row
    ([px, py, gx, gy, pref_speed, radius]); heading points at the goal
    (evaluate-mode semantics, envs/test_cases.py:556-562)."""
    return init_state(
        cfg,
        pos=case[:, 0:2],
        goal=case[:, 2:4],
        radius=case[:, 5],
        pref_speed=case[:, 4],
        policy_id=policy_id,
        dynamics_id=dynamics_id,
        rng=rng,
    )


def make_autoreset_step(
    cfg: EnvConfig,
    pool,
    policy_id,
    active_policies: Tuple[int, ...] = (policies.NONCOOP,),
    sensors: Tuple[str, ...] = ("other_agents_states",),
    states_in_obs: Tuple[str, ...] = obs_spec.DEFAULT_STATES_IN_OBS,
    params=None,
):
    """Build a single-env step fn with reset-where-done semantics.

    Args:
        pool: [N, A, 6] scenario pool (device array).
        policy_id: [A] int32 applied to every episode.

    Returns:
        step(state, counter) -> (state', counter', obs, rewards, game_over)
        — vmap over envs for a batch (give each env a different starting
        counter, e.g. ``arange(E)``, to decorrelate scenarios).
    """
    pool = jnp.asarray(pool)
    N = pool.shape[0]
    policy_id = jnp.asarray(policy_id, jnp.int32)

    def step(state: EnvState, counter):
        state, obs, rewards, game_over, _info = env_step(
            state, None, cfg, params, active_policies, sensors, states_in_obs
        )
        from gym_collision_avoidance_tpu.env.step import env_reset

        # Standard autoreset contract (cf. DummyVecEnv reset-on-done,
        # envs/vec_env.py:120-128): on reset steps the returned obs is the
        # NEW episode's first observation, matching the returned state.
        fresh, fresh_obs = env_reset(
            state_from_case(cfg, pool[counter % N], policy_id, rng=state.rng),
            cfg,
            sensors,
            states_in_obs,
        )

        def sel(new, old):
            return jnp.where(jnp.reshape(game_over, (1,) * old.ndim), new, old)

        next_state = jax.tree.map(sel, fresh, state)
        obs = jax.tree.map(sel, fresh_obs, obs)
        counter = counter + game_over.astype(jnp.int32)
        return next_state, counter, obs, rewards, game_over

    return step
