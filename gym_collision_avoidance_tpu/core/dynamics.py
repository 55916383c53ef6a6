"""Batched agent dynamics kernels.

Replaces the per-agent Dynamics objects of the reference
(``/root/reference/gym_collision_avoidance/envs/dynamics/``) with pure
vectorized functions over the whole agent batch.  Heterogeneous dynamics
(per-agent model choice) is expressed with an integer ``dynamics_id`` array
and ``jnp.where`` selection — every model is computed for every agent and
the right result selected, which is the TPU idiom (branching is the CPU
idiom).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gym_collision_avoidance_tpu.core import maths

# Dynamics type ids (state.dynamics_id values).
UNICYCLE = 0               # envs/dynamics/UnicycleDynamics.py
UNICYCLE_MAX_TURN_RATE = 1  # envs/dynamics/UnicycleDynamicsMaxTurnRate.py
EXTERNAL = 2               # envs/dynamics/ExternalDynamics.py (no-op step)

DYNAMICS_NAMES = {
    "unicycle": UNICYCLE,
    "unicycle_max_turn_rate": UNICYCLE_MAX_TURN_RATE,
    "external": EXTERNAL,
}

# Hard-coded in the reference (UnicycleDynamicsMaxTurnRate.py:15).
MAX_TURN_RATE = 3.0


def _np_wrap(a):
    import numpy as np

    # identical arithmetic to the reference's scalar while-loop
    # (envs/util.py:141-146) for |a| < 7 pi
    for _ in range(3):
        a = np.where(a >= np.pi, a - 2 * np.pi, a)
        a = np.where(a < -np.pi, a + 2 * np.pi, a)
    return a


def _np_unicycle_step(pos, heading, action, dt, max_turn_rate):
    """Host-numpy unicycle step, replicating ``UnicycleDynamics.step``
    (UnicycleDynamics.py:27-39) operation for operation.  Used by
    strict-parity mode: XLA's CPU backend contracts ``a*b + c`` chains into
    FMAs inside fusions (measured ~9% of position updates land 1 ulp off
    numpy), which no graph-level barrier prevents — so the bitwise path
    runs the arithmetic on the host exactly as the reference does."""
    import numpy as np

    sel_speed = action[..., 0]
    dheading = action[..., 1]
    if max_turn_rate is not None:
        # The reference does this whole chain in FLOAT32: actions reach
        # the dynamics through the env's f32 buffer
        # (collision_avoidance_env.py:305-306) and NumPy-2 weak promotion
        # keeps /dt, clip and *dt in f32
        # (UnicycleDynamicsMaxTurnRate.py:30-32).  Only the +heading add
        # below promotes to the state dtype.
        d32 = np.float32(dheading)
        rate32 = np.clip(d32 / np.float32(dt), -np.float32(max_turn_rate),
                         np.float32(max_turn_rate))
        dheading = (rate32 * np.float32(dt)).astype(np.asarray(heading).dtype)
    sel_heading = _np_wrap(dheading + heading)
    c = np.cos(sel_heading)
    s = np.sin(sel_heading)
    dx = sel_speed * c * dt
    dy = sel_speed * s * dt
    new_pos = pos + np.stack([dx, dy], axis=-1)
    new_vel = np.stack([sel_speed * c, sel_speed * s], axis=-1)
    delta = _np_wrap(sel_heading - heading)
    return new_pos, new_vel, sel_speed, sel_heading, delta


def unicycle_step(pos, heading, action, dt, *, max_turn_rate=None, exact=False):
    """Integrate one unicycle step for a batch of agents.

    Mirrors ``UnicycleDynamics.step`` (UnicycleDynamics.py:27-39): the agent
    instantaneously turns by ``action[...,1]`` then moves forward at
    ``action[...,0]`` for ``dt`` seconds.

    Args:
        pos:     [..., 2] positions.
        heading: [...] global-frame headings.
        action:  [..., 2] (speed, delta-heading) commands.
        dt:      scalar timestep.
        max_turn_rate: if not None, clip delta-heading/dt to +-max_turn_rate
            (UnicycleDynamicsMaxTurnRate.py:30-32).

    Returns:
        (new_pos [...,2], new_vel [...,2], new_speed [...],
         new_heading [...], delta_heading [...])
    """
    if exact:
        import functools

        shp = lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a))
        batch = heading.shape
        out_shapes = (
            shp(pos), shp(pos),
            jax.ShapeDtypeStruct(batch, pos.dtype),
            jax.ShapeDtypeStruct(batch, pos.dtype),
            jax.ShapeDtypeStruct(batch, pos.dtype),
        )
        return jax.pure_callback(
            functools.partial(_np_unicycle_step, max_turn_rate=max_turn_rate),
            out_shapes,
            pos, heading, action, dt,
            vmap_method="broadcast_all",
        )

    selected_speed = action[..., 0]
    dheading = action[..., 1]
    if max_turn_rate is not None:
        # f32 clip chain, matching the reference exactly (see
        # _np_unicycle_step): in f32 production mode this is a no-op
        # relayout; in f64 golden mode it reproduces the reference's
        # f32-buffered action arithmetic bit for bit.
        d32 = dheading.astype(jnp.float32)
        rate32 = jnp.clip(d32 / jnp.float32(dt), -jnp.float32(max_turn_rate),
                          jnp.float32(max_turn_rate))
        dheading = (rate32 * jnp.float32(dt)).astype(heading.dtype)
    selected_heading = maths.wrap(dheading + heading)

    c = jnp.cos(selected_heading)
    s = jnp.sin(selected_heading)
    dx = selected_speed * c * dt
    dy = selected_speed * s * dt
    new_pos = pos + jnp.stack([dx, dy], axis=-1)
    new_vel = jnp.stack([selected_speed * c, selected_speed * s], axis=-1)
    delta_heading = maths.wrap(selected_heading - heading)
    return new_pos, new_vel, selected_speed, selected_heading, delta_heading


def turning_dir_update(turning_dir, selected_heading):
    """CADRL turning-direction hysteresis (UnicycleDynamics.py:41-47).

    if |dir| < 1e-5:      dir = 0.11 * sign(selected_heading)
    elif dir*sel < 0:     dir = clip(-dir + sel, -pi, pi)
    else:                 dir = sign(dir) * max(0, |dir| - 0.1)
    """
    near_zero = jnp.abs(turning_dir) < 1e-5
    opposite = turning_dir * selected_heading < 0
    branch_zero = 0.11 * jnp.sign(selected_heading)
    branch_opp = jnp.clip(-turning_dir + selected_heading, -jnp.pi, jnp.pi)
    branch_decay = jnp.sign(turning_dir) * jnp.maximum(0.0, jnp.abs(turning_dir) - 0.1)
    return jnp.where(near_zero, branch_zero, jnp.where(opposite, branch_opp, branch_decay))


def step_all(pos, vel, speed, heading, delta_heading, turning_dir, dynamics_id, action, dt, exact=False):
    """Apply every dynamics model and select per-agent by ``dynamics_id``.

    EXTERNAL agents keep their current state untouched (the reference's
    ``ExternalDynamics.step`` is a no-op; real state injection happens via
    ``set_state``, envs/agent.py:155-190).

    Returns:
        (pos, vel, speed, heading, delta_heading, turning_dir) after the step.
    """
    u_pos, u_vel, u_speed, u_heading, u_dh = unicycle_step(
        pos, heading, action, dt, exact=exact
    )
    m_pos, m_vel, m_speed, m_heading, m_dh = unicycle_step(
        pos, heading, action, dt, max_turn_rate=MAX_TURN_RATE, exact=exact
    )

    is_uni = dynamics_id == UNICYCLE
    is_max = dynamics_id == UNICYCLE_MAX_TURN_RATE
    moving = is_uni | is_max
    sel = lambda u, m: jnp.where(is_uni[..., None] if u.ndim > is_uni.ndim else is_uni, u, m)

    new_pos = jnp.where(moving[..., None], sel(u_pos, m_pos), pos)
    new_vel = jnp.where(moving[..., None], sel(u_vel, m_vel), vel)
    new_speed = jnp.where(moving, sel(u_speed, m_speed), speed)
    new_heading = jnp.where(moving, sel(u_heading, m_heading), heading)
    new_dh = jnp.where(moving, sel(u_dh, m_dh), delta_heading)

    # turning_dir is only maintained by plain UnicycleDynamics
    # (UnicycleDynamics.py:41-47).
    new_turning = jnp.where(
        is_uni,
        turning_dir_update(turning_dir, new_heading_cmd(action, heading)),
        turning_dir,
    )
    return new_pos, new_vel, new_speed, new_heading, new_dh, new_turning


def new_heading_cmd(action, heading):
    """The ``selected_heading`` fed to the turning-dir hysteresis
    (UnicycleDynamics.py:28,43-47 uses the *wrapped global* heading)."""
    return maths.wrap(action[..., 1] + heading)


def _np_libm_square(a):
    """Reference-exact ``x**2``: the reference squares SCALARS
    (``goal_direction[0]**2``, agent.py:343; Dynamics.py:38), which numpy
    routes to libm ``pow`` — 1 ulp off an exact multiply on ~0.1% of
    inputs, and ALSO 1 ulp off numpy's vectorized ``arr**2`` (which
    lowers to ``np.square``).  Only a per-element libm call reproduces
    it (strict-parity is a CPU test mode; speed is irrelevant here)."""
    import math

    import numpy as np

    a = np.asarray(a, np.float64)
    return np.array([math.pow(v, 2.0) for v in a.ravel()]).reshape(a.shape)


def _np_update_ego_frame(pos, goal, heading, vel):
    """Host-numpy ego-frame refresh, replicating ``Agent.get_ref``
    (agent.py:329-349) + ``Dynamics.update_ego_frame`` (Dynamics.py:24-41)
    op for op (strict-parity mode; see _np_unicycle_step for why)."""
    import numpy as np

    gd = goal - pos
    dist = np.sqrt(_np_libm_square(gd[..., 0]) + _np_libm_square(gd[..., 1]))
    ref_prll = np.where(
        (dist > 1e-8)[..., None], gd / np.maximum(dist, 1e-30)[..., None], gd
    )
    ref_orth = np.stack([-ref_prll[..., 1], ref_prll[..., 0]], axis=-1)
    ref_angle = np.arctan2(ref_prll[..., 1], ref_prll[..., 0])
    heading_ego = _np_wrap(heading - ref_angle)
    cur_speed = np.sqrt(_np_libm_square(vel[..., 0]) + _np_libm_square(vel[..., 1]))
    vel_ego = np.stack(
        [cur_speed * np.cos(heading_ego), cur_speed * np.sin(heading_ego)],
        axis=-1,
    )
    return ref_prll, ref_orth, dist, heading_ego, vel_ego


def update_ego_frame(pos, goal, heading, vel, exact: bool = False):
    """Recompute the goal-aligned ego frame after a dynamics step.

    Mirrors ``Dynamics.update_ego_frame`` (envs/dynamics/Dynamics.py:24-41).
    ``exact`` runs the whole refresh on the host via numpy so the result is
    bit-identical to the reference (strict-parity mode).

    Returns:
        (ref_prll [...,2], ref_orth [...,2], dist_to_goal [...],
         heading_ego [...], vel_ego [...,2])
    """
    if exact:
        batch = jnp.shape(heading)
        dtype = jnp.result_type(pos)
        vec = jax.ShapeDtypeStruct(batch + (2,), dtype)
        sca = jax.ShapeDtypeStruct(batch, dtype)
        return jax.pure_callback(
            _np_update_ego_frame,
            (vec, vec, sca, sca, vec),
            pos, goal, heading, vel,
            vmap_method="broadcast_all",
        )

    ref_prll, ref_orth, dist_to_goal = maths.goal_frame_axes(pos, goal)
    ref_angle = maths.arctan2(ref_prll[..., 1], ref_prll[..., 0], exact=exact)
    heading_ego = maths.wrap(heading - ref_angle)
    cur_speed = maths.norm2(vel)
    vel_ego = jnp.stack(
        [cur_speed * jnp.cos(heading_ego), cur_speed * jnp.sin(heading_ego)], axis=-1
    )
    return ref_prll, ref_orth, dist_to_goal, heading_ego, vel_ego
