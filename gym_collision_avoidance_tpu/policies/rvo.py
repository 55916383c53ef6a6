"""RVO internal policy: batched ORCA + the reference wrapper semantics.

The reference's ``RVOPolicy`` gives *each* RVO agent a private full-world
``PyRVOSimulator``, re-mirrors every env agent into it each step, runs one
``doStep`` and reads back only the ego agent's new position
(envs/policies/RVOPolicy.py:50-122).  Because every private sim sees the
same mirrored snapshot and an agent's ORCA velocity depends only on its own
collaboration coefficient, the N private worlds collapse to ONE batched
ORCA computation with a per-agent coefficient — an O(N) win before any
kernel work.

Wrapper semantics replicated exactly:
* pref velocity points at the goal at pref_speed (:66-67),
* mirrored radius inflated by 1.05 (:71), maxSpeed = pref_speed (:70),
* new heading from the ORCA displacement, pi/6 turn limit with
  stop-and-turn (:96-111).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gym_collision_avoidance_tpu.core import maths
from gym_collision_avoidance_tpu.ops import orca
from gym_collision_avoidance_tpu.policies import registry

MAX_DELTA_HEADING = jnp.pi / 6  # RVOPolicy.py:20

# Optional params key: a [A] bool array of host-side anti-collab draws
# (True = act egoistically this window).  See anti_collab_host_draws.
NONCOOP_FLAGS_KEY = "rvo_use_noncoop"


def anti_collab_host_draws(flags, t, active, cfg, rng=np.random):
    """Reference-stream-exact anti-collaborative draws (RVOPolicy.py:77-90).

    The reference keeps a persistent ``use_non_coop_policy`` bool per RVO
    agent (initially True, RVOPolicy.py:32) and, whenever the agent's time
    hits a window boundary (``round(t % T, 3) < DT`` or
    ``round(T - t % T, 3) < DT``), redraws it from the GLOBAL numpy stream
    via ``np.random.choice([True, False], p=[1-|c|, |c|])`` — in agent-index
    order, skipping done agents (collision_avoidance_env.py:310-312).

    Call on the host each step BEFORE ``env_step`` with the agents' current
    times (``state.t``); pass the returned flags as
    ``params["rvo_use_noncoop"]`` so the jitted kernel consumes them instead
    of its default stateless PRNG derivation.  With ``rng`` seeded like the
    reference's global stream, seeded anti-collab campaigns then match the
    reference draw-for-draw.

    Args:
        flags: [A] bool, the persistent flags from the previous step
            (initialize to all-True).
        t: [A] agent times at the START of the step (``state.t``).
        active: [A] bool, which agents consume a draw this step
            (RVO policy ∧ ¬done ∧ valid).
        rng: numpy Generator or the ``np.random`` module (the reference
            uses the global module stream).

    Returns:
        [A] bool numpy array of updated flags.
    """
    flags = np.array(flags, dtype=bool)
    T = float(cfg.rvo_anti_collab_t)
    c = abs(float(cfg.rvo_collab_coeff))
    t = np.asarray(t, dtype=float)
    for a in range(flags.shape[0]):
        if not bool(active[a]):
            continue
        rem = t[a] % T
        if round(rem, 3) < cfg.dt or round(T - rem, 3) < cfg.dt:
            flags[a] = bool(rng.choice([True, False], p=[1.0 - c, c]))
    return flags


def rvo_kernel(state, cfg, params):
    dtype = state.pos.dtype
    A = state.pos.shape[0]

    goal_vec = state.goal - state.pos
    goal_dist = maths.norm2(goal_vec)
    pref_vel = state.pref_speed[:, None] * goal_vec / jnp.maximum(goal_dist, 1e-30)[:, None]

    if cfg.rvo_collab_coeff >= 0:
        collab = jnp.full((A,), cfg.rvo_collab_coeff, dtype)
    elif isinstance(params, dict) and NONCOOP_FLAGS_KEY in params:
        # Host-provided reference-stream draws (anti_collab_host_draws).
        use_noncoop = jnp.asarray(params[NONCOOP_FLAGS_KEY], bool)
        collab = jnp.where(use_noncoop, 0.0, cfg.rvo_collab_coeff).astype(dtype)
    else:
        # Anti-collaborative mode (RVOPolicy.py:77-90 + envs/config.py:84-86):
        # every RVO_ANTI_COLLAB_T seconds each agent re-chooses between
        # egoistic (coeff 0, prob 1-|c|) and adversarial (coeff |c|).  The
        # reference draws from the global numpy RNG at window boundaries; we
        # derive the draw statelessly per (agent, time-window) from the
        # env's PRNG key — same distribution, deterministic per key.
        window = jnp.floor(state.t / cfg.rvo_anti_collab_t).astype(jnp.int32)
        keys = jax.vmap(
            lambda i, w: jax.random.fold_in(jax.random.fold_in(state.rng, i), w)
        )(jnp.arange(A), window)
        use_noncoop = jax.vmap(
            lambda k: jax.random.bernoulli(k, 1.0 - abs(cfg.rvo_collab_coeff))
        )(keys)
        # the adversarial branch keeps the RAW negative coefficient
        # (RVOPolicy.py:88 passes Config.RVO_COLLAB_COEFF itself): a
        # negative reciprocity share pushes the agent INTO the collision
        # cone.
        collab = jnp.where(use_noncoop, 0.0, cfg.rvo_collab_coeff).astype(dtype)

    new_vel = orca.orca_velocities(
        state.pos,
        state.vel,
        pref_vel,
        (1.0 + 5e-2) * state.radius,
        state.pref_speed,
        collab,
        state.valid,
        jnp.asarray(cfg.dt, dtype),
        jnp.asarray(cfg.sensing_horizon, dtype),
        jnp.asarray(cfg.rvo_time_horizon, dtype),
    )

    # Position delta -> (speed, delta-heading) with stop-and-turn clamp
    # (RVOPolicy.py:96-111).
    delta_pos = new_vel * cfg.dt
    new_heading = jnp.mod(jnp.arctan2(delta_pos[:, 1], delta_pos[:, 0]), 2 * jnp.pi)
    delta_heading = maths.wrap(new_heading - state.heading)
    speed = maths.norm2(delta_pos) / cfg.dt

    exceeded = jnp.abs(delta_heading) > MAX_DELTA_HEADING
    delta_heading = jnp.where(
        exceeded, jnp.sign(delta_heading) * MAX_DELTA_HEADING, delta_heading
    )
    speed = jnp.where(exceeded, 0.0, speed)
    return jnp.stack([speed, delta_heading], axis=-1)


registry.register_internal(registry.RVO, rvo_kernel)
