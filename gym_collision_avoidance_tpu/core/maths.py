"""Batched math kernels (layer L0 of the reference).

Semantics ported from ``/root/reference/gym_collision_avoidance/envs/util.py``
but expressed as branchless, vectorized JAX ops that map onto the TPU VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TWO_PI = 2.0 * jnp.pi


def wrap(angle: jax.Array) -> jax.Array:
    """Wrap angle(s) to ``[-pi, pi)``.

    The reference uses a scalar while-loop (``envs/util.py:141-146``).  We
    unroll the same subtract/add steps as masked vector ops — for the first
    few iterations this performs the *identical* float arithmetic as the
    loop (important for parity tests), and any remaining out-of-range values
    (|angle| >> pi, which the reference never produces) are handled by a
    final mod.
    """
    for _ in range(3):
        angle = jnp.where(angle >= jnp.pi, angle - _TWO_PI, angle)
        angle = jnp.where(angle < -jnp.pi, angle + _TWO_PI, angle)
    return angle


def _np_arctan2(y, x):
    import numpy as np

    return np.arctan2(y, x)


def arctan2(y: jax.Array, x: jax.Array, exact: bool = False) -> jax.Array:
    """``atan2`` with an optional bit-exact libm mode.

    XLA's CPU ``atan2`` lowering disagrees with numpy's libm ``atan2`` by
    1 ulp on ~8% of inputs (measured), which is the sole obstacle to
    bitwise trajectory parity with the reference simulator.  With
    ``exact=True`` (strict-parity mode, CPU-only validation) the call is
    routed to host numpy via ``pure_callback``; the default compiles to the
    native XLA op (the TPU fast path)."""
    if not exact:
        return jnp.arctan2(y, x)
    y = jnp.asarray(y)
    x = jnp.asarray(x)
    shape = jnp.broadcast_shapes(y.shape, x.shape)
    dtype = jnp.result_type(y, x)
    return jax.pure_callback(
        _np_arctan2,
        jax.ShapeDtypeStruct(shape, dtype),
        y,
        x,
        vmap_method="broadcast_all",
    )


def l2norm(dx: jax.Array, dy: jax.Array) -> jax.Array:
    """sqrt(dx^2 + dy^2), elementwise (envs/util.py:17-21)."""
    return jnp.sqrt(dx * dx + dy * dy)


def norm2(vec: jax.Array, axis: int = -1) -> jax.Array:
    """Euclidean norm along ``axis``."""
    return jnp.sqrt(jnp.sum(vec * vec, axis=axis))


def goal_frame_axes(pos: jax.Array, goal: jax.Array):
    """Compute the goal-aligned ego frame axes for a batch of agents.

    Mirrors ``Agent.get_ref`` (envs/agent.py:329-349): ego x-axis points from
    the agent's position to its goal; if closer than 1e-8 the unnormalized
    (near-zero) vector is kept, exactly as the reference does.

    Args:
        pos:  [..., 2] positions.
        goal: [..., 2] goals.

    Returns:
        (ref_prll [..., 2], ref_orth [..., 2], dist_to_goal [...])
    """
    goal_direction = goal - pos
    dist = norm2(goal_direction)
    safe = jnp.maximum(dist, 1e-30)
    ref_prll = jnp.where(
        (dist > 1e-8)[..., None], goal_direction / safe[..., None], goal_direction
    )
    ref_orth = jnp.stack([-ref_prll[..., 1], ref_prll[..., 0]], axis=-1)
    return ref_prll, ref_orth, dist


def filter_vel(dt_vec: jax.Array, past_vel_xy: jax.Array) -> jax.Array:
    """dt-weighted average of past velocities -> [speed, angle].

    Mirrors ``envs/util.py:124-131``.

    Args:
        dt_vec:      [..., K] per-sample time weights.
        past_vel_xy: [..., K, 2] past global-frame velocities.

    Returns:
        [..., 2] array of (speed, angle).
    """
    denom = jnp.sum(dt_vec, axis=-1)
    avg = jnp.sum(dt_vec[..., None] * past_vel_xy, axis=-2) / denom[..., None]
    speed = norm2(avg)
    angle = jnp.arctan2(avg[..., 1], avg[..., 0])
    return jnp.stack([speed, angle], axis=-1)


def compute_time_to_impact(
    host_pos: jax.Array,
    other_pos: jax.Array,
    host_vel: jax.Array,
    other_vel: jax.Array,
    combined_radius: jax.Array,
) -> jax.Array:
    """Analytic time-to-collision via collision-cone tangents, batched.

    Branch-free port of ``envs/util.py:23-112`` +
    ``tangent_vecs_from_external_pt`` (``:85-112``).  Returns 0 when already
    overlapping, +inf when the relative velocity lies outside the collision
    cone or is (near) zero, else distance-to-circle / relative speed.
    All inputs broadcast; last axis of the positions/velocities is (x, y).
    """
    v_rel = host_vel - other_vel
    xp, yp = host_pos[..., 0], host_pos[..., 1]
    a, b = other_pos[..., 0], other_pos[..., 1]
    r = combined_radius

    dx, dy = xp - a, yp - b
    den = dx * dx + dy * dy
    sq_dist_to_perimeter = den - r * r
    already_colliding = sq_dist_to_perimeter < 0

    sqrt_term = jnp.sqrt(jnp.maximum(sq_dist_to_perimeter, 0.0))
    safe_den = jnp.maximum(den, 1e-30)
    # Tangent points on the collision circle (envs/util.py:95-106).
    xnum1 = r * r * dx
    xnum2 = r * dy * sqrt_term
    ynum1 = r * r * dy
    ynum2 = r * dx * sqrt_term
    pt1 = jnp.stack([(xnum1 + xnum2) / safe_den + a, (ynum1 - ynum2) / safe_den + b], -1)
    pt2 = jnp.stack([(xnum1 - xnum2) / safe_den + a, (ynum1 + ynum2) / safe_den + b], -1)
    vec1 = pt1 - host_pos
    vec2 = pt2 - host_pos

    def cross(u, v):
        return u[..., 0] * v[..., 1] - u[..., 1] * v[..., 0]

    # Is v_rel inside the cone spanned by vec1, vec2? (envs/util.py:39-40)
    inside = (cross(vec1, v_rel) * cross(vec1, vec2) >= 0) & (
        cross(vec2, v_rel) * cross(vec2, vec1) >= 0
    )

    v0, v1 = v_rel[..., 0], v_rel[..., 1]
    moving = (jnp.abs(v0) >= 1e-5) | (jnp.abs(v1) >= 1e-5)

    # Distance from host to the circle along v_rel (envs/util.py:41-79).
    # Solve both the generic (non-vertical) and vertical quadratics
    # branch-free and select.
    slope = v1 / jnp.where(jnp.abs(v0) < 1e-5, 1.0, v0)
    A_g = 1 + slope * slope
    B_g = -2 * a + 2 * slope * (yp - b - slope * xp)
    C_g = a * a - r * r + (slope * xp - (yp - b)) ** 2
    det_g = jnp.maximum(B_g * B_g - 4 * A_g * C_g, 0.0)
    x1 = (-B_g + jnp.sqrt(det_g)) / (2 * A_g)
    x2 = (-B_g - jnp.sqrt(det_g)) / (2 * A_g)
    y1 = slope * (x1 - xp) + yp
    y2 = slope * (x2 - xp) + yp

    B_v = -2 * b
    C_v = b * b + (xp - a) ** 2 - r * r
    det_v = jnp.maximum(B_v * B_v - 4 * C_v, 0.0)
    yv1 = (-B_v + jnp.sqrt(det_v)) / 2
    yv2 = (-B_v - jnp.sqrt(det_v)) / 2

    vertical = jnp.abs(v0) < 1e-5
    x1 = jnp.where(vertical, xp, x1)
    x2 = jnp.where(vertical, xp, x2)
    y1 = jnp.where(vertical, yv1, y1)
    y2 = jnp.where(vertical, yv2, y2)

    d1 = l2norm(x1 - xp, y1 - yp)
    d2 = l2norm(x2 - xp, y2 - yp)
    d = jnp.minimum(d1, d2)
    spd = norm2(v_rel)
    ttc = d / jnp.maximum(spd, 1e-30)

    out = jnp.where(inside & moving, ttc, jnp.inf)
    return jnp.where(already_colliding, 0.0, out)


def find_nearest(array, value):
    """For each value, the nearest entry of a 1-D array and its index
    (envs/util.py:148-153)."""
    value = jnp.atleast_1d(value)
    diffs = jnp.abs(array[None, :] - value[:, None])
    idx = jnp.argmin(diffs, axis=1)
    return array[idx], idx


def rad2deg(rad):
    return rad * 180.0 / jnp.pi


def l2normsq(x, y):
    """(x0-y0)^2 + (x1-y1)^2 (envs/util.py:20-21)."""
    return (x[..., 0] - y[..., 0]) ** 2 + (x[..., 1] - y[..., 1]) ** 2


def yaw_to_quaternion(yaw):
    """Planar yaw -> (qx, qy, qz, qw) (envs/util.py:175-188)."""
    cy = jnp.cos(yaw * 0.5)
    sy = jnp.sin(yaw * 0.5)
    return jnp.zeros_like(yaw), jnp.zeros_like(yaw), sy, cy
