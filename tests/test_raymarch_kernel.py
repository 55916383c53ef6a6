"""Pallas laserscan ray-march kernel: interpret-mode equality with the XLA
sparse path (the compiled kernel is verified bit-identical on TPU; see
PERF.md — XLA's fusion currently wins on speed, so the kernel is an
alternative backend, not the default)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.core.state import init_state
from gym_collision_avoidance_tpu.maps import grid as map_grid
from gym_collision_avoidance_tpu.obs import sensors

MAP_PNG = "/root/reference/gym_collision_avoidance/envs/world_maps/002.png"


def test_raymarch_kernel_matches_sparse_interpret(monkeypatch):
    import importlib

    from gym_collision_avoidance_tpu.ops import raymarch

    cfg = EnvConfig(dtype="float32", use_static_map=True,
                    map_x_width=10.0, map_y_width=10.0, laserscan_length=128)
    static_np = map_grid.load_static_map(cfg, MAP_PNG)
    cells = jnp.asarray(map_grid.occupied_cell_list(static_np, max_cells=128))

    rng = np.random.RandomState(3)
    E, A = 4, 4

    def mk():
        pos = rng.uniform(-4.5, 4.5, (A, 2))
        return init_state(cfg, pos=pos, goal=pos + 3,
                          radius=rng.uniform(0.2, 0.5, A),
                          pref_speed=np.ones(A),
                          heading=rng.uniform(-np.pi, np.pi, A))

    states = jax.tree.map(lambda *x: jnp.stack(x), *[mk() for _ in range(E)])
    ref = jax.vmap(lambda s: sensors.laserscan_sparse(s, cfg, cells))(states)

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    importlib.reload(raymarch)
    try:
        out = raymarch.laserscan_sparse_pallas(states, cfg, cells)
    finally:
        monkeypatch.setattr(pl, "pallas_call", orig)
        importlib.reload(raymarch)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
