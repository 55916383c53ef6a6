"""Evaluation campaigns: the TPU-native `run_full_test_suite`.

The reference loops Python episodes one at a time
(``experiments/src/run_full_test_suite.py:54-130``,
``env_utils.run_episode:45-91``).  Here all test cases of a
(policy, agent-count) cell run as ONE device batch: cases are stacked on a
leading env axis, stepped in lockstep under jit in chunks, with per-env
done masking — early-exiting between chunks once every episode is over.
Stats reproduce the reference's episode schema exactly
(env_utils.py:52-88) into a pandas DataFrame pickled per policy
(run_full_test_suite.py:107-128).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gym_collision_avoidance_tpu.config import EnvConfig
from gym_collision_avoidance_tpu.env.batch import batched_env_step
from gym_collision_avoidance_tpu.env.step import env_reset, env_step
from gym_collision_avoidance_tpu.harness import registry as hreg
from gym_collision_avoidance_tpu.harness import stats as hstats
from gym_collision_avoidance_tpu.scenarios import presets, suites


def _stack_states(states):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def run_batched_episodes(
    scenarios: Sequence[presets.Scenario],
    cfg: EnvConfig,
    params=None,
    chunk_steps: int = 128,
    max_steps: Optional[int] = None,
    collect_trajectories: bool = False,
):
    """Run one episode per scenario, all in lockstep on device.

    All scenarios must share the agent count (pad with
    ``Scenario.pad_to`` otherwise).

    Returns:
        list of per-episode stats dicts in the reference's schema
        (env_utils.py:52-88), plus [T, E, A, 2] positions if
        ``collect_trajectories``.
    """
    active = tuple(sorted(set(p for sc in scenarios for p in sc.active_policies)))
    states = _stack_states([sc.to_state(cfg) for sc in scenarios])
    E, A = states.pos.shape[0], states.pos.shape[1]
    dtype = states.pos.dtype

    straight_line_time = np.stack(
        [
            (np.linalg.norm(sc.goal - sc.pos, axis=1) - cfg.near_goal_threshold)
            / sc.pref_speed
            for sc in scenarios
        ]
    )

    if max_steps is None:
        max_steps = int(np.ceil(float(jnp.max(states.time_remaining)) / cfg.dt)) + 2

    def body(carry, _):
        state, done, steps, total_reward = carry
        state, _obs, rew, game_over, _info = batched_env_step(
            state, None, cfg, params, active
        )
        alive = ~done
        total_reward = total_reward + rew * alive[:, None]
        steps = steps + alive.astype(jnp.int32)
        done = done | game_over
        out = state.pos if collect_trajectories else None
        return (state, done, steps, total_reward), out

    @jax.jit
    def run_chunk(carry):
        return jax.lax.scan(body, carry, None, length=chunk_steps)

    carry = (
        states,
        jnp.zeros((E,), bool),
        jnp.zeros((E,), jnp.int32),
        jnp.zeros((E, A), dtype),
    )
    traj_chunks = []
    n_chunks = (max_steps + chunk_steps - 1) // chunk_steps
    for _ in range(n_chunks):
        carry, traj = run_chunk(carry)
        if collect_trajectories:
            traj_chunks.append(np.asarray(traj))
        if bool(jnp.all(carry[1])):
            break

    state, done, steps, total_reward = carry
    state, done, steps, total_reward = jax.device_get(
        (state, done, steps, total_reward)
    )

    stats = []
    for e in range(E):
        valid = np.asarray(state.valid[e])
        n_valid = int(valid.sum())
        collision, all_at_goal, any_stuck = hstats.outcome_flags(
            np.asarray(state.in_collision[e]), np.asarray(state.is_at_goal[e]),
            valid,
        )
        collision = bool(collision)
        all_at_goal = bool(all_at_goal)
        any_stuck = bool(any_stuck)
        t = np.asarray(state.t[e])[valid]
        stats.append(
            {
                "total_reward": np.asarray(total_reward[e])[valid],
                "steps": int(steps[e]),
                "num_agents": n_valid,
                "time_to_goal": t,
                "total_time_to_goal": float(np.sum(t)),
                "extra_time_to_goal": t - straight_line_time[e][valid],
                "collision": collision,
                "all_at_goal": all_at_goal,
                "any_stuck": any_stuck,
                "outcome": hstats.outcome_str(collision, all_at_goal),
            }
        )
    if collect_trajectories:
        traj = np.concatenate(traj_chunks, axis=0)  # [T, E, A, 2]
        return stats, traj
    return stats


def run_full_test_suite(
    policies_to_test: Sequence[str] = ("CADRL", "RVO", "GA3C-CADRL-10"),
    num_agents_to_test: Sequence[int] = (2, 3, 4),
    num_test_cases: int = 500,
    cfg: Optional[EnvConfig] = None,
    out_dir: Optional[str] = None,
    record_pickle_files: bool = False,
):
    """The reference's evaluation campaign (`FullTestSuite` config +
    run_full_test_suite.py), batched.

    Returns:
        {(num_agents, policy): pandas.DataFrame} with one row per episode.
    """
    import pandas as pd

    if cfg is None:
        cfg = EnvConfig.evaluate(dtype="float32")

    results = {}
    for num_agents in num_agents_to_test:
        cases = suites.preset_test_cases(
            num_agents, full_test_suite=True
        )[:num_test_cases]
        for policy in policies_to_test:
            spec = hreg.POLICY_SPECS[policy]
            pcfg = hreg.cfg_for_policy(policy, cfg)
            params = hreg.load_params(*spec.needs_params) if spec.needs_params else None
            scenarios = [
                presets.Scenario(
                    pos=c[:, 0:2], goal=c[:, 2:4], pref_speed=c[:, 4],
                    radius=c[:, 5],
                    policy_id=np.full(num_agents, spec.policy_id, np.int32),
                )
                for c in cases
            ]
            stats = run_batched_episodes(scenarios, pcfg, params)
            df = pd.DataFrame(
                [
                    {"test_case": i, "policy_id": policy, **s}
                    for i, s in enumerate(stats)
                ]
            )
            results[(num_agents, policy)] = df
            if record_pickle_files and out_dir is not None:
                d = os.path.join(out_dir, f"{num_agents}_agents", "stats")
                os.makedirs(d, exist_ok=True)
                df.to_pickle(os.path.join(d, f"stats_{policy}.p"))
    return results


def summarize_suite(results: Dict) -> "pandas.DataFrame":
    """Aggregate per-cell success rates / mean extra time-to-goal, like
    ``process_full_test_suite_pickles.py:20-34``."""
    import pandas as pd

    rows = []
    for (num_agents, policy), df in results.items():
        non_collision = df[~df["collision"]]
        pct_collision = 100.0 * df["collision"].mean()
        pct_stuck = 100.0 * (df["any_stuck"] & ~df["collision"]).mean()
        extra = np.concatenate(non_collision["extra_time_to_goal"].to_numpy().tolist()) \
            if len(non_collision) else np.array([np.nan])
        rows.append(
            {
                "num_agents": num_agents,
                "policy": policy,
                "pct_collision": pct_collision,
                "pct_stuck": pct_stuck,
                "pct_success": 100.0 - pct_collision - pct_stuck,
                "mean_extra_time_to_goal": float(np.mean(extra)),
                "p90_extra_time_to_goal": float(np.percentile(extra, 90)),
            }
        )
    return pd.DataFrame(rows)


def run_formations_campaign(
    policy: str = "GA3C-CADRL-10",
    letters: Sequence[str] = ("C", "A", "D", "R", "L"),
    num_episodes: int = 5,
    num_agents: int = 6,
    cfg: Optional[EnvConfig] = None,
    out_dir: Optional[str] = None,
    animate: bool = False,
    seed: int = 0,
):
    """Letter-formation demo (``experiments/src/run_cadrl_formations.py``):
    agents persist across episodes — each episode they navigate from
    wherever they are to the next letter's (shuffled) slots.

    Returns list of (letter, stats, [T, A, 2] trajectory).
    """
    import numpy as np

    from gym_collision_avoidance_tpu.harness import visualize

    if cfg is None:
        cfg = EnvConfig.evaluate(
            dtype="float32", near_goal_threshold=0.2,
            max_num_other_agents_observed=19,
            agent_sorting_method="closest_last",
        )
    spec = hreg.POLICY_SPECS[policy]
    pcfg = hreg.cfg_for_policy(policy, cfg)
    params = hreg.load_params(*spec.needs_params) if spec.needs_params else None
    rng = np.random.RandomState(seed)

    # initial configuration: the 6-agent small-suite circle
    current_pos = suites.preset_test_cases(num_agents)[0][:, 0:2]
    out = []
    for ep in range(num_episodes):
        letter = letters[ep % len(letters)]
        goals = suites.formation_goals(letter, num_agents, rng)
        sc = presets.Scenario(
            pos=current_pos.copy(), goal=goals,
            pref_speed=np.ones(num_agents), radius=np.full(num_agents, 0.5),
            policy_id=np.full(num_agents, spec.policy_id, np.int32),
        )
        stats, traj = run_batched_episodes(
            [sc], pcfg, params, collect_trajectories=True
        )
        T = stats[0]["steps"]
        positions = traj[:T, 0]
        current_pos = positions[-1]
        if out_dir is not None:
            png = os.path.join(out_dir, f"{ep:03d}_{letter}_{num_agents}agents.png")
            visualize.plot_episode(
                positions, np.asarray(sc.radius), goals=goals, dt=pcfg.dt,
                circles_along_traj=False, limits=[[-5, 6], [-2, 7]],
                save_path=png,
            )
            if animate:
                visualize.animate_episode(
                    positions, np.asarray(sc.radius), goals=goals, dt=pcfg.dt,
                    circles_along_traj=False, limits=[[-5, 6], [-2, 7]],
                    save_path=png.replace(".png", ".gif"),
                )
        out.append((letter, stats[0], positions))
    return out
