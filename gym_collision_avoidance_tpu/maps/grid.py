"""Occupancy-grid maps, batched.

Replaces ``envs/Map.py`` (load/resize a binary PNG, world<->grid
transforms, per-step agent-disc re-stamping) with pure array ops over a
``[H, W]`` bool grid.  The static map is env-constant data passed to the
step (shared or per-env-batched); the dynamic (agent-stamped) map is
recomputed on the fly, never stored.

Grid convention (Map.py:26-32): row index i = floor(H/2 - y/cell),
col index j = floor(W/2 + x/cell).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gym_collision_avoidance_tpu.config import EnvConfig


def world_map_path(name: str) -> str:
    """Path of a vendored world-map PNG (the reference's
    envs/world_maps/{000,001,002}.png, shipped here as package data so a
    static-map user needs no reference checkout)."""
    import os

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "world_maps",
        name if name.endswith(".png") else name + ".png",
    )
    if not os.path.exists(path):
        raise FileNotFoundError(f"no vendored world map {name!r} at {path}")
    return path


def load_static_map(cfg: EnvConfig, map_filename: str | None = None) -> np.ndarray:
    """Host-side: build the [H, W] bool static map (Map.py:12-21).

    A None filename gives an empty map; a binary PNG is inverted
    (white = free) and nearest-resized to the configured dims.
    """
    H = int(cfg.map_y_width / cfg.map_grid_cell_size)
    W = int(cfg.map_x_width / cfg.map_grid_cell_size)
    if map_filename is None:
        return np.zeros((H, W), dtype=bool)
    import imageio.v2 as imageio

    img = imageio.imread(map_filename)
    if img.ndim == 3:
        img = img[..., 0]
    if img.shape != (H, W):
        # nearest-neighbor resize (scipy.misc.imresize is long dead)
        ri = (np.arange(H) * img.shape[0] / H).astype(int)
        ci = (np.arange(W) * img.shape[1] / W).astype(int)
        img = img[ri][:, ci]
    return np.invert(img.astype(bool))


def world_to_map(pos, cfg: EnvConfig, shape):
    """[..., 2] world coords -> (i, j, in_map) grid indices (Map.py:26-44)."""
    H, W = shape
    cell = cfg.map_grid_cell_size
    oi = (cfg.map_y_width / 2.0) / cell
    oj = (cfg.map_x_width / 2.0) / cell
    i = jnp.floor(oi - pos[..., 1] / cell).astype(jnp.int32)
    j = jnp.floor(oj + pos[..., 0] / cell).astype(jnp.int32)
    in_map = (i >= 0) & (j >= 0) & (i < H) & (j < W)
    return i, j, in_map


def agent_disc_masks(pos, radius, cfg: EnvConfig, shape):
    """[A, H, W] bool disc stamps (Map.py:52-64): all-false if the agent
    center is off-map."""
    H, W = shape
    gi, gj, in_map = world_to_map(pos, cfg, shape)            # [A]
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    r_cells = radius / cfg.map_grid_cell_size
    d2 = (
        (cols[None] - gj[:, None, None]) ** 2
        + (rows[None] - gi[:, None, None]) ** 2
    )
    return (d2 < (r_cells**2)[:, None, None]) & in_map[:, None, None]


def stamp_agents(static_map, pos, radius, valid, cfg: EnvConfig):
    """static map + agent discs -> dynamic map (Map.py:46-50)."""
    masks = agent_disc_masks(pos, radius, cfg, static_map.shape)
    masks = masks & valid[:, None, None]
    return static_map | jnp.any(masks, axis=0)


def wall_collisions(static_map, pos, radius, valid, cfg: EnvConfig):
    """[A] bool: any *static* occupied cell inside the agent's disc, only if
    the agent center is in-map (collision_avoidance_env.py:494-506)."""
    masks = agent_disc_masks(pos, radius, cfg, static_map.shape)
    hit = jnp.any(masks & static_map[None], axis=(1, 2))
    return hit & valid


def occupied_cell_list(static_map: np.ndarray, max_cells: int | None = None) -> np.ndarray:
    """Host-side: the occupied (i, j) cells of a static map as a padded
    [S, 2] int32 array (-1 rows are padding) for the gather-free laserscan
    (:func:`obs.sensors.laserscan_sparse`)."""
    static_map = np.asarray(static_map)
    ii, jj = np.where(static_map)
    cells = np.stack([ii, jj], axis=1).astype(np.int32)
    if max_cells is None:
        # natural length — including 0 for an empty map: every sparse-path
        # consumer guards on shape[0] > 0, and an all-padding row would
        # still cost a full [A, (R|Wn), 1, L] pass in the hot laserscan
        max_cells = len(cells)
    if len(cells) > max_cells:
        raise ValueError(
            f"static map has {len(cells)} occupied cells > max_cells={max_cells};"
            " use the dense gather path instead"
        )
    pad = np.full((max_cells - len(cells), 2), -1, np.int32)
    return np.concatenate([cells, pad])
