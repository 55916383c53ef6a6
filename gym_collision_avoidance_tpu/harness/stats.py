"""Single source of truth for episode-outcome statistics.

Mirrors the reference's ``run_episode`` stats block
(``experiments/src/env_utils.py:52-88``):

    collision   = any(agent.in_collision)
    all_at_goal = all(agent.is_at_goal)
    any_stuck   = any(not in_collision and not is_at_goal)
    outcome     = "collision" | "all_at_goal" | "stuck"  (that priority)

Used by both the in-graph rollout summary (``harness.runner``) and the
host-side batched-experiment stats (``harness.experiments``) so the two
paths cannot drift.  The functions are array-module agnostic: they work on
numpy arrays (host post-processing) and on jax arrays inside jit.
"""

from __future__ import annotations

import numpy as np


def outcome_flags(in_collision, is_at_goal, valid=None):
    """(collision, all_at_goal, any_stuck) with the reference's semantics.

    ``valid`` masks padded agent slots (the reference has no padding; a
    padded slot counts as neither colliding, at-goal, nor stuck).
    """
    import jax
    import jax.numpy as jnp

    xp = jnp if isinstance(in_collision, jax.Array) else np
    if valid is None:
        valid = xp.ones(np.shape(in_collision), bool)
    in_c = in_collision & valid
    at_g = is_at_goal & valid
    collision = xp.any(in_c)
    all_at_goal = xp.all(at_g | ~valid)
    any_stuck = xp.any(~in_c & ~at_g & valid)
    return collision, all_at_goal, any_stuck


def outcome_str(collision, all_at_goal) -> str:
    """The reference's outcome priority (env_utils.py:71-73)."""
    return (
        "collision" if bool(collision)
        else "all_at_goal" if bool(all_at_goal) else "stuck"
    )
