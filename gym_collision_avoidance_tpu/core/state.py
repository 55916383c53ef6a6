"""The env state pytree: struct-of-arrays over agents.

Replaces the reference's mutable per-agent objects
(``/root/reference/gym_collision_avoidance/envs/agent.py:59-139``) with a
single pytree whose leaves have a leading ``[num_agents]`` axis.  Batch over
environments by ``jax.vmap``-ing the step over a leading ``[num_envs]`` axis
(see :mod:`gym_collision_avoidance_tpu.parallel`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from gym_collision_avoidance_tpu.config import EnvConfig
from gym_collision_avoidance_tpu.core import maths

# Number of past actions / velocities remembered per agent
# (reference: envs/agent.py:38 `num_actions_to_store = 2`).
NUM_PAST_ACTIONS = 2


@struct.dataclass
class EnvState:
    """All mutable simulation state for one environment.

    Leaves have leading axis ``A = num_agents``.  Field-by-field provenance
    is the reference's ``Agent.reset`` (envs/agent.py:59-139).
    """

    # -- kinematic state --
    pos: jax.Array            # [A, 2] pos_global_frame
    vel: jax.Array            # [A, 2] vel_global_frame
    speed: jax.Array          # [A]    speed_global_frame
    heading: jax.Array        # [A]    heading_global_frame
    delta_heading: jax.Array  # [A]    delta_heading_global_frame

    # -- task --
    goal: jax.Array           # [A, 2] goal_global_frame
    radius: jax.Array         # [A]
    pref_speed: jax.Array     # [A]

    # -- ego (goal-aligned) frame, updated after each dynamics step
    #    (envs/dynamics/Dynamics.py:24-41) --
    ref_prll: jax.Array       # [A, 2]
    ref_orth: jax.Array       # [A, 2]
    dist_to_goal: jax.Array   # [A]
    heading_ego_frame: jax.Array  # [A]
    vel_ego_frame: jax.Array  # [A, 2]

    # -- ring buffers (envs/agent.py:91-92, 121-122) --
    past_actions: jax.Array   # [A, NUM_PAST_ACTIONS, 2]
    past_vel: jax.Array       # [A, NUM_PAST_ACTIONS, 2] past_global_velocities

    # -- CADRL turning-direction hysteresis (envs/agent.py:133,
    #    envs/dynamics/UnicycleDynamics.py:41-47) --
    turning_dir: jax.Array    # [A]

    # -- timers (envs/agent.py:100-108) --
    time_remaining: jax.Array  # [A] time_remaining_to_reach_goal
    t: jax.Array               # [A] elapsed sim time
    step_num: jax.Array        # [A] int32

    # -- done latching (envs/agent.py:110-114, 138) --
    is_at_goal: jax.Array              # [A] bool
    was_at_goal_already: jax.Array     # [A] bool
    in_collision: jax.Array            # [A] bool
    was_in_collision_already: jax.Array  # [A] bool
    ran_out_of_time: jax.Array         # [A] bool
    is_done: jax.Array                 # [A] bool

    # -- sensor caches (envs/agent.py:124, 46; full matrix mirrors the
    #    obs-dict entry produced by OtherAgentsStatesSensor that NN policies
    #    consume on the *next* step) --
    other_agent_states: jax.Array       # [A, 7] closest-other 7-tuple
    sensed_others: jax.Array            # [A, K, 7] last sensor output
    num_other_agents_observed: jax.Array  # [A] int32

    # -- laserscan stacked history (LaserScanSensor.py:43-44, 84-90);
    #    empty [A, 0, 0] when cfg.use_static_map is off --
    laserscan_history: jax.Array        # [A, P, L]
    laserscan_count: jax.Array          # [A] int32

    # -- per-agent component wiring (integer type ids; replaces the
    #    reference's per-Agent policy/dynamics/sensor objects,
    #    envs/agent.py:31-33) --
    policy_id: jax.Array      # [A] int32, see policies.registry
    dynamics_id: jax.Array    # [A] int32, see core.dynamics

    # -- padding support: False rows are absent agents --
    valid: jax.Array          # [A] bool

    # -- per-env bookkeeping (scalars) --
    episode_step: jax.Array   # int32
    rng: jax.Array            # jax PRNG key (uint32[2] or typed key)

    @property
    def num_agents(self) -> int:
        return self.pos.shape[-2]


def init_state(
    cfg: EnvConfig,
    pos: np.ndarray,
    goal: np.ndarray,
    radius: np.ndarray,
    pref_speed: np.ndarray,
    heading: np.ndarray | None = None,
    policy_id: np.ndarray | None = None,
    dynamics_id: np.ndarray | None = None,
    valid: np.ndarray | None = None,
    rng: jax.Array | None = None,
) -> EnvState:
    """Build a freshly-reset :class:`EnvState` (mirrors ``Agent.reset``,
    envs/agent.py:59-139, followed by ``update_ego_frame``).

    Any ``heading`` entry that is NaN is replaced by the direction to the
    goal (envs/agent.py:79-83).
    """
    dtype = jnp.dtype(cfg.dtype)
    pos = jnp.asarray(pos, dtype)
    goal = jnp.asarray(goal, dtype)
    radius = jnp.asarray(radius, dtype)
    pref_speed = jnp.asarray(pref_speed, dtype)
    A = pos.shape[0]

    vec_to_goal = goal - pos
    auto_heading = maths.arctan2(
        vec_to_goal[:, 1], vec_to_goal[:, 0], exact=cfg.strict_parity
    )
    if heading is None:
        heading = auto_heading
    else:
        heading = jnp.asarray(heading, dtype)
        heading = jnp.where(jnp.isnan(heading), auto_heading, heading)

    vel = jnp.zeros((A, 2), dtype)

    # Timeout budget (envs/agent.py:100-105).
    straight_line_time = (maths.norm2(vec_to_goal) - cfg.near_goal_threshold) / pref_speed
    time_remaining = jnp.maximum(cfg.max_time_ratio * straight_line_time, cfg.dt)

    # Ego frame at reset (envs/agent.py:126 -> Dynamics.update_ego_frame).
    from gym_collision_avoidance_tpu.core import dynamics as dyn

    ref_prll, ref_orth, dist_to_goal, heading_ego, vel_ego = dyn.update_ego_frame(
        pos, goal, heading, vel, exact=cfg.strict_parity
    )

    if policy_id is None:
        # Default to NonCooperative (id 2), not EXTERNAL (id 0): a state
        # built without explicit wiring should move on its own.
        policy_id = jnp.full((A,), 2, jnp.int32)
    if dynamics_id is None:
        dynamics_id = jnp.zeros((A,), jnp.int32)
    if valid is None:
        valid = jnp.ones((A,), bool)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    zeros_a = jnp.zeros((A,), dtype)
    false_a = jnp.zeros((A,), bool)

    return EnvState(
        pos=pos,
        vel=vel,
        speed=zeros_a,
        heading=heading,
        delta_heading=zeros_a,
        goal=goal,
        radius=radius,
        pref_speed=pref_speed,
        ref_prll=ref_prll,
        ref_orth=ref_orth,
        dist_to_goal=dist_to_goal,
        heading_ego_frame=heading_ego,
        vel_ego_frame=vel_ego,
        past_actions=jnp.zeros((A, NUM_PAST_ACTIONS, 2), dtype),
        past_vel=jnp.zeros((A, NUM_PAST_ACTIONS, 2), dtype),
        turning_dir=zeros_a,
        time_remaining=time_remaining,
        t=zeros_a,
        step_num=jnp.zeros((A,), jnp.int32),
        is_at_goal=false_a,
        was_at_goal_already=false_a,
        in_collision=false_a,
        was_in_collision_already=false_a,
        ran_out_of_time=false_a,
        is_done=~jnp.asarray(valid, bool),
        other_agent_states=jnp.zeros((A, 7), dtype),
        sensed_others=jnp.zeros((A, cfg.max_num_other_agents_observed, 7), dtype),
        num_other_agents_observed=jnp.zeros((A,), jnp.int32),
        laserscan_history=jnp.zeros(
            (A, cfg.laserscan_num_past, cfg.laserscan_length) if cfg.use_static_map
            else (A, 0, 0),
            dtype,
        ),
        laserscan_count=jnp.zeros((A,), jnp.int32),
        policy_id=jnp.asarray(policy_id, jnp.int32),
        dynamics_id=jnp.asarray(dynamics_id, jnp.int32),
        valid=jnp.asarray(valid, bool),
        episode_step=jnp.asarray(0, jnp.int32),
        rng=rng,
    )


def apply_external_states(
    state: EnvState,
    cfg: EnvConfig,
    pos: jax.Array,
    vel: jax.Array | None = None,
    heading: jax.Array | None = None,
    mask: jax.Array | None = None,
) -> EnvState:
    """Inject externally-measured states (real robot / Gazebo), mirroring
    ``Agent.set_state`` (envs/agent.py:155-190): missing velocities are
    interpolated from the position delta (zero on the first step), missing
    headings come from the velocity direction; delta-heading is wrapped.

    Args:
        mask: [A] bool — which agents to update (default: agents with
            EXTERNAL dynamics).
    """
    from gym_collision_avoidance_tpu.core import dynamics as dyn

    dtype = state.pos.dtype
    pos = jnp.asarray(pos, dtype)
    if mask is None:
        mask = state.dynamics_id == dyn.EXTERNAL

    if vel is None:
        interp = (pos - state.pos) / cfg.dt
        vel = jnp.where((state.step_num == 0)[:, None], 0.0, interp)
    else:
        vel = jnp.asarray(vel, dtype)

    if heading is None:
        heading = jnp.arctan2(vel[:, 1], vel[:, 0])
    else:
        heading = jnp.asarray(heading, dtype)
    delta_heading = maths.wrap(heading - state.heading)

    speed = maths.norm2(vel)
    sel = lambda new, old: jnp.where(
        mask.reshape(mask.shape + (1,) * (old.ndim - 1)), new, old
    )
    return state.replace(
        pos=sel(pos, state.pos),
        vel=sel(vel, state.vel),
        speed=sel(speed, state.speed),
        heading=sel(heading, state.heading),
        delta_heading=sel(delta_heading, state.delta_heading),
    )
