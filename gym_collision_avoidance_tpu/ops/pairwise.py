"""Fused pairwise collision / nearest-gap kernel (Pallas TPU).

The innermost O(A^2) geometry of the env step
(collision_avoidance_env.py:458-512): per agent, whether any other agent
overlaps it and the min surface gap.  The XLA path (env/step.py
``_pairwise_collisions``) fuses well already; this Pallas version keeps the
[A, A] tile entirely in VMEM across a block of envs and exists as the
speed-of-light reference for large-A configs (``LargeNumAgents``, A=40) —
use :func:`pairwise_collisions` with ``backend="pallas"`` on TPU.

Outputs are bit-identical to the jnp path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is absent on CPU-only builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

_INF = jnp.inf


def _kernel(pos_ref, radius_ref, valid_ref, coll_ref, nearest_ref):
    # blocks: pos [EB, A, 2], radius [EB, A], valid [EB, A]
    pos = pos_ref[:]
    radius = radius_ref[:]
    valid = valid_ref[:]
    EB, A, _ = pos.shape

    dx = pos[:, :, None, 0] - pos[:, None, :, 0]          # [EB, A, A]
    dy = pos[:, :, None, 1] - pos[:, None, :, 1]
    dist = jnp.sqrt(dx * dx + dy * dy)
    comb = radius[:, :, None] + radius[:, None, :]

    eye = jax.lax.broadcasted_iota(jnp.int32, (A, A), 0) == jax.lax.broadcasted_iota(
        jnp.int32, (A, A), 1
    )
    pair_valid = valid[:, :, None] & valid[:, None, :] & ~eye[None]

    gap = jnp.where(pair_valid, dist - comb, _INF)
    nearest_ref[:] = jnp.min(gap, axis=2)
    coll_ref[:] = jnp.any(pair_valid & (dist <= comb), axis=2)


@functools.partial(jax.jit, static_argnames=("backend", "env_block"))
def pairwise_collisions(pos, radius, valid, backend: str = "jnp",
                        env_block: int = 8):
    """(collision [E, A] bool, nearest_gap [E, A]) for an env batch.

    Args:
        pos: [E, A, 2]; radius, valid: [E, A].
        backend: "jnp" (XLA-fused) or "pallas" (TPU kernel).
    """
    E, A, _ = pos.shape
    if backend == "jnp" or not _HAS_PLTPU:
        dx = pos[:, :, None, 0] - pos[:, None, :, 0]
        dy = pos[:, :, None, 1] - pos[:, None, :, 1]
        dist = jnp.sqrt(dx * dx + dy * dy)
        comb = radius[:, :, None] + radius[:, None, :]
        eye = jnp.eye(A, dtype=bool)
        pair_valid = valid[:, :, None] & valid[:, None, :] & ~eye[None]
        gap = jnp.where(pair_valid, dist - comb, _INF)
        return jnp.any(pair_valid & (dist <= comb), axis=2), jnp.min(gap, axis=2)

    EB = min(env_block, E)
    assert E % EB == 0, f"num envs {E} must divide env_block {EB}"
    grid = (E // EB,)
    coll, nearest = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((EB, A, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EB, A), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((EB, A), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((EB, A), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((EB, A), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((E, A), jnp.bool_),
            jax.ShapeDtypeStruct((E, A), pos.dtype),
        ),
    )(pos, radius, valid)
    return coll, nearest
