"""Pytree checkpoint/resume (env states, training carries, params).

The reference has no environment checkpointing at all — only frozen policy
checkpoints (SURVEY.md §5.4).  Here the whole env (or env-batch) state is a
pytree, so checkpoint/resume is a structural save/restore; useful for
long evaluation campaigns and fault recovery.  The functions are generic
over any pytree with array leaves — the PPO trainer saves its whole
``(params, opt_state, env_states, counters, obs)`` carry through them for
bitwise training resume (tests/test_ppo.py).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from gym_collision_avoidance_tpu.core.state import EnvState


def save_state(path: str, state: EnvState) -> str:
    """Write the state pytree (any batch shape) to an .npz."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    leaves, treedef = jax.tree.flatten(state)
    np.savez(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )
    return path


def load_state(path: str, like: EnvState) -> EnvState:
    """Restore a state saved by :func:`save_state`.

    ``like`` provides the pytree structure; the saved treedef blob must
    match it exactly (a mismatched state would otherwise silently
    misassign leaves of compatible shapes).
    """
    treedef = jax.tree.structure(like)
    with np.load(path) as z:
        saved_treedef = bytes(z["__treedef__"]).decode()
        if saved_treedef != str(treedef):
            raise ValueError(
                f"checkpoint {path!r} was saved with a different EnvState "
                f"structure:\n  saved: {saved_treedef}\n  expected: {treedef}"
            )
        n = sum(k.startswith("leaf_") for k in z.files)
        if n != treedef.num_leaves:
            raise ValueError(
                f"checkpoint {path!r} has {n} leaves, expected "
                f"{treedef.num_leaves}"
            )
        leaves = [z[f"leaf_{i}"] for i in range(n)]
    return jax.tree.unflatten(treedef, leaves)
