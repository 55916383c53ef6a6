"""The jit-compiled environment step.

This is the TPU-native replacement for
``CollisionAvoidanceEnv.step`` / ``reset``
(``/root/reference/gym_collision_avoidance/envs/collision_avoidance_env.py:156-234,
236-282``) plus ``Agent.take_action`` (``envs/agent.py:192-241``): a single
pure function over the :class:`EnvState` pytree in which every agent of the
env advances in lockstep.  Batch over environments with ``jax.vmap``; see
:mod:`gym_collision_avoidance_tpu.parallel` for multi-chip sharding.

Ordering semantics replicated from the reference (see call stack in
SURVEY.md §3.1):

1. action selection (internal policies query state, external actions are
   mapped),
2. simultaneous dynamics update with done-freezing + ``was_*`` latching,
3. rewards from the *new* positions with collision latching,
4. sensing / observation assembly,
5. done flags + game-over reduction.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gym_collision_avoidance_tpu import config as cfg_mod
from gym_collision_avoidance_tpu.config import EnvConfig
from gym_collision_avoidance_tpu.core import dynamics as dyn
from gym_collision_avoidance_tpu.core import maths
from gym_collision_avoidance_tpu.core.state import EnvState
from gym_collision_avoidance_tpu.maps import grid as map_grid
from gym_collision_avoidance_tpu.obs import sensors as sensors_mod
from gym_collision_avoidance_tpu.obs import spec as obs_spec
from gym_collision_avoidance_tpu.policies import registry as policies


def _take_actions(state: EnvState, actions: jax.Array, cfg: EnvConfig) -> EnvState:
    """Batched equivalent of calling ``Agent.take_action`` on every agent
    (envs/agent.py:192-241)."""
    dtype = state.pos.dtype
    dt = jnp.asarray(cfg.dt, dtype)

    # Done freeze & was_* latching (envs/agent.py:202-209): agents that were
    # already at-goal / out-of-time / in-collision stop moving and latch.
    frozen = state.is_at_goal | state.ran_out_of_time | state.in_collision
    active = ~frozen & state.valid
    was_at_goal_already = state.was_at_goal_already | (frozen & state.is_at_goal)
    was_in_collision_already = state.was_in_collision_already | (
        frozen & state.in_collision
    )

    # Past-action ring buffer: rolled only for active agents
    # (envs/agent.py:212-213).
    rolled_actions = jnp.concatenate(
        [actions[:, None, :], state.past_actions[:, :-1, :]], axis=1
    )
    past_actions = jnp.where(active[:, None, None], rolled_actions, state.past_actions)

    # Dynamics (envs/agent.py:223 -> dynamics_model.step).
    new_pos, new_vel, new_speed, new_heading, new_dh, new_turning = dyn.step_all(
        state.pos,
        state.vel,
        state.speed,
        state.heading,
        state.delta_heading,
        state.turning_dir,
        state.dynamics_id,
        actions,
        dt,
        exact=cfg.strict_parity,
    )
    pos = jnp.where(active[:, None], new_pos, state.pos)
    # Frozen agents get their velocity zeroed (envs/agent.py:207).
    vel = jnp.where(active[:, None], new_vel, jnp.zeros_like(state.vel))
    vel = jnp.where(state.valid[:, None], vel, state.vel)
    speed = jnp.where(active, new_speed, state.speed)
    heading = jnp.where(active, new_heading, state.heading)
    delta_heading = jnp.where(active, new_dh, state.delta_heading)
    turning_dir = jnp.where(active, new_turning, state.turning_dir)

    # Ego-frame refresh (envs/agent.py:225 -> Dynamics.update_ego_frame);
    # frozen agents keep stale ego-frame values.
    ref_prll, ref_orth, dist_to_goal, heading_ego, vel_ego = dyn.update_ego_frame(
        pos, state.goal, heading, vel, exact=cfg.strict_parity
    )
    ref_prll = jnp.where(active[:, None], ref_prll, state.ref_prll)
    ref_orth = jnp.where(active[:, None], ref_orth, state.ref_orth)
    dist_to_goal = jnp.where(active, dist_to_goal, state.dist_to_goal)
    heading_ego = jnp.where(active, heading_ego, state.heading_ego_frame)
    vel_ego = jnp.where(active[:, None], vel_ego, state.vel_ego_frame)

    # Goal check on the new position (envs/agent.py:150-153, squared form).
    d2 = jnp.sum((pos - state.goal) ** 2, axis=-1)
    is_at_goal = jnp.where(
        active, d2 <= cfg.near_goal_threshold**2, state.is_at_goal
    )

    # Past-velocity ring buffer: rolled for everyone — frozen agents store
    # their zeroed velocity (envs/agent.py:208, 232).
    past_vel = jnp.concatenate([vel[:, None, :], state.past_vel[:, :-1, :]], axis=1)
    past_vel = jnp.where(state.valid[:, None, None], past_vel, state.past_vel)

    # Timers (envs/agent.py:235-239): only active agents burn time.
    time_remaining = jnp.where(active, state.time_remaining - dt, state.time_remaining)
    ran_out_of_time = jnp.where(active, time_remaining <= 0.0, state.ran_out_of_time)
    t = jnp.where(active, state.t + dt, state.t)
    step_num = jnp.where(active, state.step_num + 1, state.step_num)

    return state.replace(
        pos=pos,
        vel=vel,
        speed=speed,
        heading=heading,
        delta_heading=delta_heading,
        turning_dir=turning_dir,
        ref_prll=ref_prll,
        ref_orth=ref_orth,
        dist_to_goal=dist_to_goal,
        heading_ego_frame=heading_ego,
        vel_ego_frame=vel_ego,
        past_actions=past_actions,
        past_vel=past_vel,
        is_at_goal=is_at_goal,
        was_at_goal_already=was_at_goal_already,
        was_in_collision_already=was_in_collision_already,
        time_remaining=time_remaining,
        ran_out_of_time=ran_out_of_time,
        t=t,
        step_num=step_num,
    )


def _pairwise_collisions(state: EnvState, cfg: EnvConfig):
    """Masked O(A^2) pairwise collision / nearest-distance check.

    Replaces the ``itertools.combinations`` Python loop
    (envs/collision_avoidance_env.py:458-512).

    Returns:
        (collision_with_agent [A] bool, dist_btwn_nearest_agent [A]).
    """
    A = state.pos.shape[0]
    rel = state.pos[None, :, :] - state.pos[:, None, :]
    dist = maths.norm2(rel)                                  # [A, A]
    combined_radius = state.radius[:, None] + state.radius[None, :]
    pair_valid = (
        state.valid[:, None] & state.valid[None, :] & ~jnp.eye(A, dtype=bool)
    )
    gap = jnp.where(pair_valid, dist - combined_radius, jnp.inf)
    dist_btwn_nearest = jnp.min(gap, axis=1)
    collision = jnp.any(pair_valid & (dist <= combined_radius), axis=1)
    return collision, dist_btwn_nearest


def _compute_rewards(state: EnvState, cfg: EnvConfig, static_map=None):
    """Reward shaping + collision latching
    (envs/collision_avoidance_env.py:394-456)."""
    dtype = state.pos.dtype
    collision_with_agent, dist_nearest = _pairwise_collisions(state, cfg)
    if cfg.use_static_map and static_map is not None:
        collision_with_wall = map_grid.wall_collisions(
            static_map, state.pos, state.radius, state.valid, cfg
        )
    else:
        collision_with_wall = jnp.zeros_like(collision_with_agent)

    r = jnp.full((state.pos.shape[0],), cfg.reward_time_step, dtype)

    goal_now = state.is_at_goal & ~state.was_at_goal_already
    r = jnp.where(goal_now, cfg.reward_at_goal, r)

    eligible = ~state.is_at_goal & ~state.was_in_collision_already
    hit_agent = eligible & collision_with_agent
    hit_wall = eligible & ~collision_with_agent & collision_with_wall
    r = jnp.where(hit_agent, cfg.reward_collision_with_agent, r)
    r = jnp.where(hit_wall, cfg.reward_collision_with_wall, r)

    no_hit = eligible & ~collision_with_agent & ~collision_with_wall
    close = no_hit & (dist_nearest <= cfg.getting_close_range)
    # The -0.1 - d/2 shaping is hard-coded in the reference (":438-440");
    # cfg.reward_getting_close carries the -0.1.
    r = jnp.where(close, cfg.reward_getting_close - dist_nearest / 2.0, r)
    wiggly = no_hit & (jnp.abs(state.past_actions[:, 0, 1]) > cfg.wiggly_behavior_threshold)
    r = jnp.where(wiggly, r + cfg.reward_wiggly_behavior, r)

    # Clip to the min/max possible single-step reward (":451-453, 589-599").
    possible = [
        cfg.reward_at_goal,
        cfg.reward_collision_with_agent,
        cfg.reward_time_step,
        cfg.reward_collision_with_wall,
        cfg.reward_wiggly_behavior,
    ]
    r = jnp.clip(r, min(possible), max(possible))
    r = jnp.where(state.valid, r, 0.0)

    in_collision = state.in_collision | hit_agent | hit_wall
    return state.replace(in_collision=in_collision), r


def normalize_sensor_spec(sensors, num_agents: int):
    """Parse the static sensors argument into ``{name: ego_idx or None}``.

    Each entry is either a sensor name (equipped on every agent, the
    reference's common case) or a ``(name, (i0, i1, ...))`` pair equipping
    only the listed agents — the analog of the reference's per-Agent sensor
    lists (envs/agent.py:31-33).  A full-coverage tuple collapses to None
    (the all-agents fast path, no gather/scatter at all).
    """
    spec = {}
    for entry in sensors:
        if isinstance(entry, str):
            spec[entry] = None
        else:
            name, idx = entry
            idx = tuple(int(i) for i in idx)
            spec[name] = None if idx == tuple(range(num_agents)) else idx
    return spec


def _equipped_mask(idx, num_agents: int):
    """[A] bool constant: which agents carry a subset-equipped sensor."""
    m = np.zeros(num_agents, bool)
    m[list(idx)] = True
    return jnp.asarray(m)


def _sense_and_observe(state: EnvState, cfg: EnvConfig, sensors,
                       states_in_obs: Sequence[str], static_map=None,
                       static_cells=None):
    """Sensor pass + obs assembly (envs/collision_avoidance_env.py:555-575).

    ``static_cells`` ([S, 2] padded occupied-cell list) switches the
    laserscan to the gather-free sparse path — identical outputs, far
    faster on TPU (see obs.sensors.laserscan_sparse).

    ``sensors`` entries may be names or ``(name, agent_idx_tuple)`` pairs
    (see :func:`normalize_sensor_spec`): subset-equipped expensive sensors
    compute only their agents' rows (the laserscan cost is linear in ego
    rows); unequipped rows keep their defaults — exactly the reference's
    never-sensed agent state.
    """
    A = state.pos.shape[0]
    spec = normalize_sensor_spec(sensors, A)
    sensed = {}
    needs_map = ("laserscan" in spec and static_cells is None) or (
        "occupancy_grid" in spec
    )
    if needs_map:
        if static_map is None or not cfg.use_static_map:
            raise ValueError(
                "laserscan/occupancy_grid sensors need cfg.use_static_map=True "
                "and a static_map array (or static_cells for the sparse "
                "laserscan)"
            )
        dynamic_map = map_grid.stamp_agents(
            static_map, state.pos, state.radius, state.valid, cfg
        )
    sense_info = {}
    if "laserscan" in spec:
        idx = spec["laserscan"]
        if static_cells is not None:
            ranges_e, laser_ovf = sensors_mod.laserscan_sparse(
                state, cfg, static_cells, ego_idx=idx, return_overflow=True
            )
            if (cfg.laserscan_entry_window is not None
                    or cfg.laserscan_num_candidate_discs is not None):
                # exactness guard for the windowed / wedge-culled fast
                # paths: True means this step's ranges may diverge from
                # the full pass (see laserscan_sparse)
                sense_info["laserscan_exactness_overflow"] = laser_ovf
        else:
            ranges_e = sensors_mod.laserscan(state, cfg, dynamic_map,
                                             ego_idx=idx)
        if idx is None:
            ranges, equipped = ranges_e, None
        else:
            # scatter the subset rows back to [A, L]; unequipped rows read
            # max-range (they are never consumed)
            ranges = jnp.full(
                (A, ranges_e.shape[-1]), sensors_mod.LASER_MAX_RANGE,
                ranges_e.dtype,
            ).at[jnp.asarray(idx, jnp.int32)].set(ranges_e)
            equipped = _equipped_mask(idx, A)
        rolled = jnp.concatenate(
            [ranges[:, None, :], state.laserscan_history[:, :-1, :]], axis=1
        )
        # First-ever measurement fills the whole history
        # (LaserScanSensor.py:84-88).
        first = (state.laserscan_count == 0)[:, None, None]
        hist = jnp.where(
            first, jnp.broadcast_to(ranges[:, None, :], rolled.shape), rolled
        )
        count = state.laserscan_count + 1
        if equipped is not None:
            # unequipped agents never sense: history and count stay put
            hist = jnp.where(equipped[:, None, None], hist,
                             state.laserscan_history)
            count = jnp.where(equipped, count, state.laserscan_count)
        state = state.replace(laserscan_history=hist, laserscan_count=count)
        sensed["laserscan"] = hist
    if "occupancy_grid" in spec:
        og = sensors_mod.occupancy_grid(state, cfg, dynamic_map)
        idx = spec["occupancy_grid"]
        if idx is not None:
            og = og & _equipped_mask(idx, A)[:, None, None]
        sensed["occupancy_grid"] = og
    if "other_agents_states" in spec:
        rows, closest, counts = sensors_mod.other_agents_states(state, cfg)
        idx = spec["other_agents_states"]
        if idx is not None:
            eq = _equipped_mask(idx, A)
            rows = jnp.where(eq[:, None, None], rows, state.sensed_others)
            closest = jnp.where(eq[:, None], closest, state.other_agent_states)
            counts = jnp.where(eq, counts, state.num_other_agents_observed)
        sensed["other_agents_states"] = rows
        state = state.replace(
            other_agent_states=closest,
            sensed_others=rows,
            num_other_agents_observed=counts,
        )
    obs = obs_spec.build_observation(state, cfg, sensed, states_in_obs)
    return state, obs, sense_info


def _check_dones(state: EnvState, cfg: EnvConfig):
    """Done flags + episode game-over
    (envs/collision_avoidance_env.py:514-553)."""
    which_done = state.is_at_goal | state.ran_out_of_time | state.in_collision
    is_done = which_done | ~state.valid

    if cfg.done_mode == cfg_mod.DONE_MODE_EVALUATE:
        game_over = jnp.all(which_done | ~state.valid)
    elif cfg.done_mode == cfg_mod.DONE_MODE_SINGLE_AGENT:
        game_over = which_done[0]
    elif cfg.done_mode == cfg_mod.DONE_MODE_LEARNING:
        learning = policies._isin(state.policy_id, policies.STILL_LEARNING_POLICIES)
        game_over = jnp.all(which_done | ~state.valid | ~learning)
    else:
        raise ValueError(f"unknown done mode {cfg.done_mode}")

    return state.replace(is_done=is_done), which_done, game_over


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "active_policies", "sensors", "states_in_obs"),
)
def env_step(
    state: EnvState,
    ext_actions: Optional[jax.Array],
    cfg: EnvConfig,
    params=None,
    active_policies: Tuple[int, ...] = (policies.NONCOOP,),
    sensors: Tuple[str, ...] = ("other_agents_states",),
    states_in_obs: Tuple[str, ...] = obs_spec.DEFAULT_STATES_IN_OBS,
    static_map=None,
    static_cells=None,
    precomputed_actions=None,
):
    """Advance one env by one timestep.

    Args:
        state: [A]-leaved :class:`EnvState`.
        ext_actions: [A, 2] external actions (ignored entries for agents
            with internal policies), or None if no external policies.
        cfg: static :class:`EnvConfig`.
        params: pytree of policy parameters (NN weights), or None.
        active_policies: static tuple of policy ids present in the scenario.
        sensors: static tuple of active sensor names.
        states_in_obs: static tuple of obs keys.

    Returns:
        (new_state, obs dict, rewards [A], game_over scalar bool, info dict)
    """
    # StaticPolicy pins its goal to the current position every step it is
    # queried (envs/policies/StaticPolicy.py:21); done agents aren't queried.
    if policies.STATIC in active_policies:
        pin = (state.policy_id == policies.STATIC) & ~state.is_done
        state = state.replace(goal=jnp.where(pin[:, None], state.pos, state.goal))

    if precomputed_actions is not None:
        # Batched fast path: actions were computed over the whole env batch
        # (policies.compute_actions_batched) before vmapping into this step.
        actions = jnp.where(state.is_done[:, None], 0.0, precomputed_actions)
    else:
        actions = policies.compute_actions(state, ext_actions, cfg, params, active_policies)
    if cfg.cast_actions_to_f32:
        # The reference buffers all actions through a float32 array before
        # stepping dynamics (envs/collision_avoidance_env.py:304-306).
        actions = actions.astype(jnp.float32).astype(state.pos.dtype)

    state = _take_actions(state, actions, cfg)
    state, rewards = _compute_rewards(state, cfg, static_map)
    state, obs, sense_info = _sense_and_observe(
        state, cfg, sensors, states_in_obs, static_map, static_cells
    )
    state, which_done, game_over = _check_dones(state, cfg)
    state = state.replace(episode_step=state.episode_step + 1)

    info = {
        "which_agents_done": which_done,
        "which_agents_learning": policies._isin(
            state.policy_id, policies.STILL_LEARNING_POLICIES
        ),
        **sense_info,
    }
    return state, obs, rewards, game_over, info


@functools.partial(
    jax.jit, static_argnames=("cfg", "sensors", "states_in_obs")
)
def env_reset(
    state: EnvState,
    cfg: EnvConfig,
    sensors: Tuple[str, ...] = ("other_agents_states",),
    states_in_obs: Tuple[str, ...] = obs_spec.DEFAULT_STATES_IN_OBS,
    static_map=None,
    static_cells=None,
):
    """Compute the initial observation for a freshly-initialized state
    (mirrors ``reset`` -> ``_get_obs``,
    envs/collision_avoidance_env.py:236-282).

    Build ``state`` itself with :func:`core.state.init_state` from a
    scenario (host-side), then call this.
    """
    state, obs, _sense_info = _sense_and_observe(
        state, cfg, sensors, states_in_obs, static_map, static_cells
    )
    return state, obs
