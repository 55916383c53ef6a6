"""Unit tests for L0 math kernels against the reference implementations."""

import numpy as np
import jax.numpy as jnp

from gym_collision_avoidance_tpu.core import maths, dynamics as dyn

from tests.oracle import refsim


def _ref_util():
    refsim.import_reference()
    from gym_collision_avoidance.envs import util

    return util


def test_wrap_matches_reference():
    util = _ref_util()
    angles = np.concatenate(
        [
            np.linspace(-3 * np.pi, 3 * np.pi, 101),
            [np.pi, -np.pi, 0.0, np.pi - 1e-12, -np.pi + 1e-12],
        ]
    )
    ours = np.asarray(maths.wrap(jnp.asarray(angles)))
    theirs = np.array([util.wrap(a) for a in angles])
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_filter_vel_matches_reference():
    util = _ref_util()
    rng = np.random.RandomState(0)
    for _ in range(20):
        dt_vec = rng.uniform(0.05, 0.3, size=3)
        past = rng.randn(3, 2)
        ours = np.asarray(maths.filter_vel(jnp.asarray(dt_vec), jnp.asarray(past)))
        theirs = util.filter_vel(dt_vec, past)
        np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_time_to_impact_matches_reference():
    util = _ref_util()
    rng = np.random.RandomState(1)
    n_checked = 0
    for _ in range(200):
        hp = rng.uniform(-5, 5, 2)
        op = rng.uniform(-5, 5, 2)
        hv = rng.uniform(-2, 2, 2)
        ov = rng.uniform(-2, 2, 2)
        r = rng.uniform(0.3, 1.5)
        theirs = util.compute_time_to_impact(hp, op, hv, ov, r)
        ours = float(
            maths.compute_time_to_impact(
                jnp.asarray(hp), jnp.asarray(op), jnp.asarray(hv), jnp.asarray(ov), r
            )
        )
        if np.isinf(theirs):
            assert np.isinf(ours), (hp, op, hv, ov, r)
        else:
            np.testing.assert_allclose(ours, theirs, atol=1e-9)
            n_checked += 1
    assert n_checked > 20  # make sure finite cases were exercised


def test_turning_dir_matches_reference_hysteresis():
    # Port of UnicycleDynamics.py:41-47 run as a scalar reference.
    def ref_update(turning_dir, selected_heading):
        if abs(turning_dir) < 1e-5:
            return 0.11 * np.sign(selected_heading)
        elif turning_dir * selected_heading < 0:
            return max(-np.pi, min(np.pi, -turning_dir + selected_heading))
        else:
            return np.sign(turning_dir) * max(0.0, abs(turning_dir) - 0.1)

    rng = np.random.RandomState(2)
    tds = rng.uniform(-np.pi, np.pi, 50)
    tds[:5] = [0.0, 1e-6, -1e-6, 0.11, -0.11]
    heads = rng.uniform(-np.pi, np.pi, 50)
    ours = np.asarray(dyn.turning_dir_update(jnp.asarray(tds), jnp.asarray(heads)))
    theirs = np.array([ref_update(t, h) for t, h in zip(tds, heads)])
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_unicycle_step_basic():
    pos = jnp.array([[0.0, 0.0]])
    heading = jnp.array([0.0])
    action = jnp.array([[1.0, np.pi / 2]])
    new_pos, new_vel, speed, new_heading, dh = dyn.unicycle_step(
        pos, heading, action, 0.5
    )
    np.testing.assert_allclose(np.asarray(new_pos), [[0.0, 0.5]], atol=1e-12)
    np.testing.assert_allclose(float(new_heading[0]), np.pi / 2, atol=1e-12)
    np.testing.assert_allclose(np.asarray(new_vel), [[0.0, 1.0]], atol=1e-12)


def test_max_turn_rate_clips():
    pos = jnp.array([[0.0, 0.0]])
    heading = jnp.array([0.0])
    action = jnp.array([[1.0, np.pi]])  # pi rad in dt=0.2 -> 15.7 rad/s > 3.0
    _, _, _, new_heading, _ = dyn.unicycle_step(
        pos, heading, action, 0.2, max_turn_rate=dyn.MAX_TURN_RATE
    )
    np.testing.assert_allclose(float(new_heading[0]), 0.6, atol=1e-12)
