"""Episode rollout harness.

Replaces the reference's Python while-loop episode runner
(``experiments/src/env_utils.py:45-91``) with an on-device ``lax.scan`` so a
whole episode (or fixed step budget) compiles into one XLA program.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gym_collision_avoidance_tpu.config import EnvConfig
from gym_collision_avoidance_tpu.core.state import EnvState
from gym_collision_avoidance_tpu.env.step import env_step
from gym_collision_avoidance_tpu.harness import stats as hstats
from gym_collision_avoidance_tpu.obs import spec as obs_spec
from gym_collision_avoidance_tpu.policies import registry as policies


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "num_steps", "active_policies", "sensors",
                     "states_in_obs", "collect_obs"),
)
def rollout(
    state: EnvState,
    cfg: EnvConfig,
    num_steps: int,
    params=None,
    active_policies: Tuple[int, ...] = (policies.NONCOOP,),
    sensors: Tuple[str, ...] = ("other_agents_states",),
    states_in_obs: Tuple[str, ...] = obs_spec.DEFAULT_STATES_IN_OBS,
    collect_obs: bool = False,
):
    """Run ``num_steps`` env steps under one jit, stacking per-step outputs.

    Returns:
        (final_state, traj) where traj is a dict of [T, ...] arrays:
        pos, vel, heading, rewards, game_over, is_at_goal, in_collision,
        ran_out_of_time (+ obs/* if collect_obs).
    """

    def body(state, _):
        state, obs, rewards, game_over, info = env_step(
            state, None, cfg, params, active_policies, sensors, states_in_obs
        )
        out = {
            "pos": state.pos,
            "vel": state.vel,
            "heading": state.heading,
            "rewards": rewards,
            "game_over": game_over,
            "is_at_goal": state.is_at_goal,
            "in_collision": state.in_collision,
            "ran_out_of_time": state.ran_out_of_time,
        }
        if collect_obs:
            out["obs"] = obs
        return state, out

    final_state, traj = jax.lax.scan(body, state, None, length=num_steps)
    return final_state, traj


def episode_stats(traj, cfg: EnvConfig):
    """Summarize a rollout into the reference's episode-stats schema
    (``experiments/src/env_utils.py:52-88``): total_reward, steps until
    game-over, outcome flags.  The flag semantics come from
    ``harness.stats`` (the single implementation shared with the batched
    experiment harness)."""
    game_over = traj["game_over"]
    T = game_over.shape[0]
    # First step index at which the episode was over (or T).
    ever = jnp.any(game_over)
    first_done = jnp.argmax(game_over)
    steps = jnp.where(ever, first_done + 1, T)
    step_mask = jnp.arange(T) < steps
    total_reward = jnp.sum(traj["rewards"] * step_mask[:, None], axis=0)
    per_agent_collision = jnp.any(
        traj["in_collision"] & step_mask[:, None], axis=0
    )
    at_goal = traj["is_at_goal"][steps - 1]
    collision, all_at_goal, any_stuck = hstats.outcome_flags(
        per_agent_collision, at_goal
    )
    return {
        "steps": steps,
        "total_reward": total_reward,
        "collision": per_agent_collision,
        "all_at_goal": all_at_goal,
        "any_stuck": any_stuck,
        "time_to_goal": steps * cfg.dt,
    }
