"""Pallas pairwise kernel: equality with the XLA path (interpret mode on
CPU; the compiled kernel is exercised on TPU by scripts/bench_all.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from gym_collision_avoidance_tpu.ops import pairwise


def test_jnp_path_matches_env_step_semantics():
    rng = np.random.RandomState(0)
    E, A = 6, 8
    pos = jnp.asarray(rng.uniform(-5, 5, (E, A, 2)))
    radius = jnp.asarray(rng.uniform(0.3, 1.2, (E, A)))
    valid = jnp.asarray(rng.rand(E, A) > 0.2)
    coll, near = pairwise.pairwise_collisions(pos, radius, valid, backend="jnp")

    # brute-force oracle
    for e in range(E):
        for i in range(A):
            gaps = []
            hit = False
            for j in range(A):
                if i == j or not bool(valid[e, i]) or not bool(valid[e, j]):
                    continue
                d = float(jnp.linalg.norm(pos[e, i] - pos[e, j]))
                c = float(radius[e, i] + radius[e, j])
                gaps.append(d - c)
                hit |= d <= c
            expect = min(gaps) if gaps else np.inf
            np.testing.assert_allclose(float(near[e, i]), expect, atol=1e-6)
            assert bool(coll[e, i]) == hit


def test_pallas_kernel_matches_jnp_interpret():
    from jax.experimental import pallas as pl
    from gym_collision_avoidance_tpu.ops.pairwise import _kernel

    rng = np.random.RandomState(1)
    E, A = 8, 16
    pos = jnp.asarray(rng.uniform(-5, 5, (E, A, 2)), jnp.float32)
    radius = jnp.asarray(rng.uniform(0.3, 1.2, (E, A)), jnp.float32)
    valid = jnp.asarray(rng.rand(E, A) > 0.2)

    coll_ref, near_ref = pairwise.pairwise_collisions(pos, radius, valid, backend="jnp")
    EB = 4
    coll, near = pl.pallas_call(
        _kernel,
        grid=(E // EB,),
        in_specs=[
            pl.BlockSpec((EB, A, 2), lambda i: (i, 0, 0)),
            pl.BlockSpec((EB, A), lambda i: (i, 0)),
            pl.BlockSpec((EB, A), lambda i: (i, 0)),
        ],
        out_specs=(
            pl.BlockSpec((EB, A), lambda i: (i, 0)),
            pl.BlockSpec((EB, A), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((E, A), jnp.bool_),
            jax.ShapeDtypeStruct((E, A), jnp.float32),
        ),
        interpret=True,
    )(pos, radius, valid)
    np.testing.assert_array_equal(np.asarray(coll), np.asarray(coll_ref))
    np.testing.assert_allclose(np.asarray(near), np.asarray(near_ref), atol=1e-6)
