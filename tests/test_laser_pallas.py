"""Fused windowed-laserscan Pallas kernel (ops/laser_pallas.py):
interpret-mode equality with the XLA staged path on CPU.  The compiled
kernel is verified bit-identical at bench scale on TPU
(scripts/ab_laser_r5.py); XLA currently wins on speed, so the kernel is
a validated alternative backend, not the default (PERF.md round 5)."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
import pytest

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.core.state import init_state
from gym_collision_avoidance_tpu.maps import grid as map_grid
from gym_collision_avoidance_tpu.obs import sensors


def _cfg():
    return EnvConfig(
        dtype="float32", use_static_map=True,
        map_x_width=20.0, map_y_width=20.0,
        max_num_other_agents_observed=19,
        agent_sorting_method="closest_last",
        laserscan_num_candidate_discs=9,
        laserscan_entry_window=12,
        laserscan_beam_slots=4,
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_laser_pallas_matches_xla_interpret(monkeypatch, seed):
    cfg = _cfg()
    static_np = map_grid.load_static_map(cfg, None)  # empty bench map
    cells = jnp.asarray(map_grid.occupied_cell_list(static_np))

    rng = np.random.RandomState(40 + seed)
    A = 20
    pos = rng.uniform(-7.0, 7.0, (A, 2))
    state = init_state(
        cfg, pos=pos, goal=-pos,
        radius=rng.uniform(0.2, 0.45, A),
        pref_speed=np.ones(A),
        heading=rng.uniform(-np.pi, np.pi, A),
    )
    state = jax.tree.map(
        lambda x: x.astype(jnp.float32)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        state,
    )

    ref, ref_ovf = sensors.laserscan_sparse(
        state, cfg, cells, return_overflow=True
    )

    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(pl.pallas_call, interpret=True)
    )
    monkeypatch.setattr(sensors, "_WBC_PALLAS", True)
    jax.clear_caches()  # laserscan_sparse may be cached via env_step jit
    try:
        out, ovf = sensors.laserscan_sparse(
            state, cfg, cells, return_overflow=True
        )
    finally:
        jax.clear_caches()

    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    assert bool(ref_ovf) == bool(ovf)
