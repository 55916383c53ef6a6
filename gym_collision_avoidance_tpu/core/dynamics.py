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


def unicycle_step(pos, heading, action, dt, *, max_turn_rate=None):
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
    selected_speed = action[..., 0]
    dheading = action[..., 1]
    if max_turn_rate is not None:
        dheading = jnp.clip(dheading / dt, -max_turn_rate, max_turn_rate) * dt
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


def step_all(pos, vel, speed, heading, delta_heading, turning_dir, dynamics_id, action, dt):
    """Apply every dynamics model and select per-agent by ``dynamics_id``.

    EXTERNAL agents keep their current state untouched (the reference's
    ``ExternalDynamics.step`` is a no-op; real state injection happens via
    ``set_state``, envs/agent.py:155-190).

    Returns:
        (pos, vel, speed, heading, delta_heading, turning_dir) after the step.
    """
    u_pos, u_vel, u_speed, u_heading, u_dh = unicycle_step(pos, heading, action, dt)
    m_pos, m_vel, m_speed, m_heading, m_dh = unicycle_step(
        pos, heading, action, dt, max_turn_rate=MAX_TURN_RATE
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


def update_ego_frame(pos, goal, heading, vel):
    """Recompute the goal-aligned ego frame after a dynamics step.

    Mirrors ``Dynamics.update_ego_frame`` (envs/dynamics/Dynamics.py:24-41).

    Returns:
        (ref_prll [...,2], ref_orth [...,2], dist_to_goal [...],
         heading_ego [...], vel_ego [...,2])
    """
    ref_prll, ref_orth, dist_to_goal = maths.goal_frame_axes(pos, goal)
    ref_angle = jnp.arctan2(ref_prll[..., 1], ref_prll[..., 0])
    heading_ego = maths.wrap(heading - ref_angle)
    cur_speed = maths.norm2(vel)
    vel_ego = jnp.stack(
        [cur_speed * jnp.cos(heading_ego), cur_speed * jnp.sin(heading_ego)], axis=-1
    )
    return ref_prll, ref_orth, dist_to_goal, heading_ego, vel_ego
