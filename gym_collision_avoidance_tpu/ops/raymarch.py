"""Pallas TPU ray-march kernel for the sparse laserscan.

The XLA sparse path (obs/sensors.py:laserscan_sparse) materializes a
[batch, A, beams, A+S] comparison tensor per range sample — ~42 ms per
256-env call at 20 agents.  This kernel marches HB (=8) host agents per
program, keeping all per-beam state in VMEM across the 60-sample loop,
with occupancy evaluated analytically exactly like the sparse path: agent
discs by the circle-stamp inequality on the sample's (floored) cell
indices, static obstacles against a padded occupied-cell list.  Outputs
are bit-identical to :func:`obs.sensors.laserscan_sparse`.

Inputs are laid out host-major ([E*A, ...], each row carrying its own
env's agent table) so blocks satisfy Mosaic's (8, 128) tiling rules.  All
arithmetic is f32 (cell indices are small integers, exact in f32); the
cumsum==1 last-index "first hit" rule of the reference
(LaserScanSensor.py:78-82) is carried as (count, index) rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from gym_collision_avoidance_tpu.obs.sensors import (
    LASER_MAX_ANGLE,
    LASER_MAX_RANGE,
    LASER_MIN_ANGLE,
    LASER_RANGE_RESOLUTION,
    _range_samples,
)

HB = 8  # host agents per program (Mosaic sublane granule)


def _make_kernel(A, L, S, R, oi, oj, inv_cell, H, W):
    def kernel(rsamples_ref, host_pos_ref, heading_ref, pos_ref, radius_ref,
               valid_ref, host_onehot_ref, cells_ref, angles0_ref, out_ref):
        # blocks: rsamples [R] (SMEM), host_pos [HB, 2], heading [HB, 1],
        # pos [HB, A, 2], radius [HB, A], valid [HB, A], host_onehot [HB, A],
        # cells [S, 2], angles0 [1, L], out [HB, L]
        # The range/angle tables come from the host so their float values
        # match the XLA path bit-for-bit (arange/linspace computed in f64
        # under jax_enable_x64 then cast differs from in-kernel k*dr).
        pos = pos_ref[:]                                     # [HB, A, 2]
        gi = jnp.floor(oi - pos[:, :, 1] * inv_cell)         # [HB, A]
        gj = jnp.floor(oj + pos[:, :, 0] * inv_cell)
        center_in = (gi >= 0) & (gj >= 0) & (gi < H) & (gj < W)
        disc_ok = center_in & valid_ref[:]                   # [HB, A]
        is_host = host_onehot_ref[:] > 0.5
        other_ok = disc_ok & ~is_host
        ego_ok = disc_ok & is_host
        r_cells_sq = (radius_ref[:] * inv_cell) ** 2         # [HB, A]

        if S > 0:
            cells = cells_ref[:]                             # [S, 2]

        ang = angles0_ref[:] + heading_ref[:]                # [HB, L]
        cos_a = jnp.cos(ang)
        sin_a = jnp.sin(ang)
        px0 = host_pos_ref[:, 0:1]                           # [HB, 1]
        py0 = host_pos_ref[:, 1:2]

        def body(k, carry):
            cnt, rng_val = carry                             # [HB, L]
            r = rsamples_ref[k]
            px = px0 + r * cos_a                             # [HB, L]
            py = py0 + r * sin_a
            ii = jnp.floor(oi - py * inv_cell)
            jj = jnp.floor(oj + px * inv_cell)
            in_map = (ii >= 0) & (jj >= 0) & (ii < H) & (jj < W)

            # agent/cell loops are unrolled with STATIC indices — Mosaic
            # supports neither dynamic lane indexing of refs nor
            # dynamic_slice of values, and a 3-D [HB, A, L] broadcast
            # compiles to scalarized code.  Everything stays on native
            # [HB, L] tiles.
            agent_hit = jnp.zeros((HB, L), jnp.bool_)
            in_ego = jnp.zeros((HB, L), jnp.bool_)
            for a in range(A):
                di = ii - gi[:, a:a + 1]                     # [HB, L]
                dj = jj - gj[:, a:a + 1]
                in_d = di * di + dj * dj < r_cells_sq[:, a:a + 1]
                agent_hit = agent_hit | (in_d & other_ok[:, a:a + 1])
                in_ego = in_ego | (in_d & ego_ok[:, a:a + 1])

            hit = agent_hit
            if S > 0:
                static_hit = jnp.zeros((HB, L), jnp.bool_)
                for c in range(S):
                    ci = cells[c, 0].astype(jnp.float32)
                    cj = cells[c, 1].astype(jnp.float32)
                    ok = cells[c, 0] >= 0
                    static_hit = static_hit | ((ii == ci) & (jj == cj) & ok)
                hit = hit | static_hit
            hit = hit & ~in_ego & in_map

            cnt = cnt + hit.astype(jnp.float32)
            # cumsum==1 last-assignment rule: the range VALUE is stored so
            # the output matches the host rsamples table exactly.
            rng_val = jnp.where(cnt == 1.0, r, rng_val)
            return cnt, rng_val

        zeros = jnp.zeros((HB, L), jnp.float32)
        cnt, rng_val = jax.lax.fori_loop(
            0, R, body, (zeros, zeros + LASER_MAX_RANGE)
        )
        out_ref[:] = rng_val

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg",))
def laserscan_sparse_pallas(states, cfg, static_cells):
    """Batched laserscan over [E, A]-leaved states (TPU Pallas kernel).

    Bit-identical to ``vmap(laserscan_sparse)``.  Requires E*A % 8 == 0.

    Returns:
        [E, A, L] ranges in the sim dtype.
    """
    if not _HAS_PLTPU:
        raise RuntimeError("pallas TPU backend unavailable")
    E, A = states.pos.shape[:2]
    N = E * A
    assert N % HB == 0, f"E*A={N} must be a multiple of {HB}"
    L = cfg.laserscan_length
    S = int(static_cells.shape[0])
    R = int(LASER_MAX_RANGE / LASER_RANGE_RESOLUTION)
    H = int(cfg.map_y_width / cfg.map_grid_cell_size)
    W = int(cfg.map_x_width / cfg.map_grid_cell_size)
    cell = cfg.map_grid_cell_size
    oi = (cfg.map_y_width / 2.0) / cell
    oj = (cfg.map_x_width / 2.0) / cell

    f32 = jnp.float32
    # host-major layouts [E*A, ...]: each host row carries its env's table
    host_pos = states.pos.astype(f32).reshape(N, 2)
    heading = states.heading.astype(f32).reshape(N, 1)
    pos_env = jnp.broadcast_to(
        states.pos.astype(f32)[:, None], (E, A, A, 2)
    ).reshape(N, A, 2)
    radius_env = jnp.broadcast_to(
        states.radius.astype(f32)[:, None], (E, A, A)
    ).reshape(N, A)
    valid_env = jnp.broadcast_to(
        states.valid[:, None], (E, A, A)
    ).reshape(N, A)
    host_onehot = jnp.broadcast_to(
        jnp.eye(A, dtype=f32)[None], (E, A, A)
    ).reshape(N, A)

    # host-computed tables (must match the XLA path's float values exactly)
    angles0 = jnp.linspace(
        LASER_MIN_ANGLE, LASER_MAX_ANGLE, L
    ).astype(f32).reshape(1, L)
    # Same k*resolution in-dtype product form as the sparse path
    # (obs/sensors.py:_range_samples) — arange's start+i*step fill differs
    # by 1 ulp at 17/60 entries in f32, which broke bit-parity in round 2.
    rsamples = _range_samples(f32)

    kernel = _make_kernel(A, L, S, R, oi, oj, 1.0 / cell, H, W)
    out = pl.pallas_call(
        kernel,
        grid=(N // HB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((HB, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HB, A, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HB, A), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HB, A), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((HB, A), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((HB, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, L), f32),
    )(rsamples, host_pos, heading, pos_env, radius_env, valid_env,
      host_onehot, static_cells, angles0)
    return out.reshape(E, A, L).astype(states.pos.dtype)
