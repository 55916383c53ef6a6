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
    from gym_collision_avoidance_tpu.env.step import env_reset

    pool = jnp.asarray(pool)
    N = pool.shape[0]
    policy_id = jnp.asarray(policy_id, jnp.int32)
    acc = jnp.dtype(cfg.dtype)

    # Precompute every pool entry's freshly-reset state AND its first
    # observation ONCE at build time.  The previous version re-ran
    # init_state + the full reset sensor pass inside every step for every
    # env (the branchless price of reset-where-done), which made the
    # serving loop ~100x slower than the plain step.  Selecting a
    # precomputed row by one-hot contraction is a tiny [E, N] x [N, ...]
    # matmul instead.
    pool_states, pool_obs = jax.vmap(
        lambda case: env_reset(
            state_from_case(cfg, case, policy_id), cfg, sensors, states_in_obs
        )
    )(pool)

    def pick(onehot_f, leaf):
        """Select one [N, ...] pool row by one-hot contraction (exact: a
        single 1.0 coefficient against finite values; integers stay below
        2^24 so the float round-trip is lossless)."""
        if leaf.dtype == jnp.bool_:
            return jnp.einsum("n,n...->...", onehot_f, leaf.astype(acc)) > 0.5
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.einsum("n,n...->...", onehot_f.astype(leaf.dtype), leaf)
        if jnp.issubdtype(leaf.dtype, jnp.signedinteger):
            v = jnp.einsum("n,n...->...", onehot_f, leaf.astype(acc))
            return jnp.round(v).astype(leaf.dtype)
        # uint PRNG keys don't survive a float contraction; the rng is
        # overridden with the live stream below, so any row works.
        return leaf[0]

    def step(state: EnvState, counter):
        state, obs, rewards, game_over, _info = env_step(
            state, None, cfg, params, active_policies, sensors, states_in_obs
        )

        # Standard autoreset contract (cf. DummyVecEnv reset-on-done,
        # envs/vec_env.py:120-128): on reset steps the returned obs is the
        # NEW episode's first observation, matching the returned state.
        onehot_f = (jnp.arange(N) == counter % N).astype(acc)
        fresh = jax.tree.map(lambda leaf: pick(onehot_f, leaf), pool_states)
        fresh = fresh.replace(rng=state.rng)
        fresh_obs = jax.tree.map(lambda leaf: pick(onehot_f, leaf), pool_obs)

        def sel(new, old):
            return jnp.where(jnp.reshape(game_over, (1,) * old.ndim), new, old)

        next_state = jax.tree.map(sel, fresh, state)
        obs = jax.tree.map(sel, fresh_obs, obs)
        counter = counter + game_over.astype(jnp.int32)
        return next_state, counter, obs, rewards, game_over

    return step
