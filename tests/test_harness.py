"""Experiment harness: batched test-suite evaluation + plotting."""

import os

import numpy as np
import pytest

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.harness import experiments, registry, visualize
from gym_collision_avoidance_tpu.scenarios import presets, suites


def test_batched_episodes_stats_schema():
    import numpy as np
    cases = suites.preset_test_cases(2)[:3]
    # a non-conflicting parallel-lanes case that must end all_at_goal
    cases.append(np.array([[-3.0, 0.0, 3.0, 0.0, 1.0, 0.3],
                           [-3.0, 2.0, 3.0, 2.0, 1.0, 0.3]]))
    cfg = EnvConfig.evaluate(dtype="float64")
    scenarios = [presets.from_cadrl_case(c, policy="noncoop") for c in cases]
    stats = experiments.run_batched_episodes(scenarios, cfg)
    assert len(stats) == 4
    for s in stats:
        assert set(s) >= {
            "total_reward", "steps", "num_agents", "time_to_goal",
            "total_time_to_goal", "extra_time_to_goal", "collision",
            "all_at_goal", "any_stuck", "outcome",
        }
        assert s["num_agents"] == 2
        assert s["outcome"] in ("collision", "all_at_goal", "stuck")
    # head-on noncoop case collides; parallel-lanes case reaches goals
    assert stats[0]["outcome"] == "collision"
    assert stats[3]["outcome"] == "all_at_goal"


def test_outcome_flags_semantics():
    """harness.stats is the single outcome implementation; its semantics
    must match the reference's run_episode (env_utils.py:52-88)."""
    from gym_collision_avoidance_tpu.harness import stats as hstats

    f = np.array([False, False])
    t = np.array([True, True])
    # all at goal
    c, g, s = hstats.outcome_flags(f, t)
    assert (bool(c), bool(g), bool(s)) == (False, True, False)
    assert hstats.outcome_str(c, g) == "all_at_goal"
    # one collided, one at goal -> collision wins, nobody stuck
    c, g, s = hstats.outcome_flags(np.array([True, False]), np.array([False, True]))
    assert (bool(c), bool(g), bool(s)) == (True, False, False)
    assert hstats.outcome_str(c, g) == "collision"
    # neither collided nor at goal -> stuck (NOT timeout-based)
    c, g, s = hstats.outcome_flags(f, np.array([True, False]))
    assert (bool(c), bool(g), bool(s)) == (False, False, True)
    assert hstats.outcome_str(c, g) == "stuck"
    # padded slot is invisible
    c, g, s = hstats.outcome_flags(
        np.array([False, True]), np.array([True, False]),
        valid=np.array([True, False]))
    assert (bool(c), bool(g), bool(s)) == (False, True, False)
    # jax arrays work identically (used inside jit by harness.runner)
    import jax.numpy as jnp
    c, g, s = hstats.outcome_flags(jnp.array(f), jnp.array([True, False]))
    assert (bool(c), bool(g), bool(s)) == (False, False, True)


def test_batched_stats_match_reference_run_episode():
    """The batched stats must equal the reference's run_episode stats for
    the same scenario (same schema AND same values)."""
    from tests.oracle import refsim

    case = suites.preset_test_cases(2)[2]  # offset crossing, reaches goals
    refsim.import_reference()
    from gym_collision_avoidance.envs import Config as RefConfig

    # The oracle must terminate on "all done" like our evaluate done-mode.
    orig_mode = RefConfig.EVALUATE_MODE
    RefConfig.EVALUATE_MODE = True
    env = refsim.make_env_from_case(case)

    # manually replicate run_episode (env_utils.py:45-88) on the oracle
    try:
        total_reward = 0
        step = 0
        terminated = False
        while not terminated and step < 500:
            _obs, rew, terminated, _tr, _info = env.step(None)
            total_reward += rew
            step += 1
        ref_time_to_goal = np.array([a.t for a in env.agents])
        ref_extra = np.array(
            [a.t - a.straight_line_time_to_reach_goal for a in env.agents]
        )
    finally:
        RefConfig.EVALUATE_MODE = orig_mode

    cfg = EnvConfig(dtype="float64", done_mode="evaluate")
    sc = presets.from_cadrl_case(case, policy="noncoop")
    stats = experiments.run_batched_episodes([sc], cfg)[0]
    assert stats["steps"] == step
    np.testing.assert_allclose(stats["time_to_goal"], ref_time_to_goal, atol=1e-6)
    np.testing.assert_allclose(stats["extra_time_to_goal"], ref_extra, atol=1e-6)
    np.testing.assert_allclose(stats["total_reward"], total_reward, atol=1e-5)


def test_mini_full_test_suite_and_summary(tmp_path):
    results = experiments.run_full_test_suite(
        policies_to_test=("RVO", "GA3C-CADRL-10"),
        num_agents_to_test=(2,),
        num_test_cases=8,
        out_dir=str(tmp_path),
        record_pickle_files=True,
    )
    assert set(results) == {(2, "RVO"), (2, "GA3C-CADRL-10")}
    for df in results.values():
        assert len(df) == 8
        assert "outcome" in df.columns
    summary = experiments.summarize_suite(results)
    assert len(summary) == 2
    assert (summary["pct_success"] >= 0).all()
    assert os.path.exists(tmp_path / "2_agents" / "stats" / "stats_RVO.p")


def test_plot_and_animate(tmp_path):
    cfg = EnvConfig.evaluate(dtype="float32")
    sc = presets.circle_scenario(4, radius=3.0, agent_radius=0.3)
    stats, traj = experiments.run_batched_episodes(
        [sc], cfg, collect_trajectories=True, max_steps=64
    )
    png = visualize.plot_episode(
        traj[:, 0], np.asarray(sc.radius), goals=sc.goal,
        steps=stats[0]["steps"], dt=cfg.dt,
        save_path=str(tmp_path / "000_test_4agents.png"),
    )
    assert os.path.getsize(png) > 10_000
    gif = visualize.animate_episode(
        traj[:, 0], np.asarray(sc.radius), goals=sc.goal,
        steps=min(stats[0]["steps"], 30), dt=cfg.dt, period_steps=10,
        save_path=str(tmp_path / "000_test_4agents.gif"), save_mp4=True,
    )
    assert os.path.getsize(gif) > 10_000
    # MP4 assembly alongside the GIF (envs/visualize.py:81-88)
    assert os.path.getsize(tmp_path / "000_test_4agents.mp4") > 1_000


def test_collision_copy_and_perturbed_overlay(tmp_path):
    """Collision episodes get a copy under <dir>/collisions/
    (envs/visualize.py:34-35,148-149); the adversarial overlay draws
    (envs/visualize.py:259-303)."""
    cfg = EnvConfig.evaluate(dtype="float32")
    sc = presets.two_agents_swap()
    stats, traj = experiments.run_batched_episodes(
        [sc], cfg, collect_trajectories=True, max_steps=64
    )
    png = visualize.plot_episode(
        traj[:, 0], np.asarray(sc.radius), goals=sc.goal,
        steps=stats[0]["steps"], dt=cfg.dt,
        save_path=str(tmp_path / "000_swap_2agents.png"),
        in_collision=np.array([True, False]),
        perturbed={
            "other_pos": np.asarray(sc.pos[1]),
            "perturbed_pos": np.asarray(sc.pos[1]) + 0.4,
            "radius": float(sc.radius[1]),
            "steps": np.asarray(sc.pos[1]) + np.linspace(0, 0.4, 5)[:, None],
        },
    )
    assert os.path.getsize(png) > 10_000
    assert os.path.getsize(tmp_path / "collisions" / "000_swap_2agents.png") > 10_000
    # a non-collision save makes no copy
    visualize.plot_episode(
        traj[:, 0], np.asarray(sc.radius), goals=sc.goal,
        steps=stats[0]["steps"], dt=cfg.dt,
        save_path=str(tmp_path / "001_swap_2agents.png"),
        in_collision=np.array([False, False]),
    )
    assert not os.path.exists(tmp_path / "collisions" / "001_swap_2agents.png")


def test_formations_campaign(tmp_path):
    from gym_collision_avoidance_tpu.harness import experiments

    out = experiments.run_formations_campaign(
        num_episodes=2, out_dir=str(tmp_path), seed=0
    )
    assert [letter for letter, _, _ in out] == ["C", "A"]
    for _letter, stats, traj in out:
        assert stats["outcome"] == "all_at_goal"
    assert os.path.exists(tmp_path / "000_C_6agents.png")


def test_batched_episodes_with_padded_mixed_sizes():
    """Scenarios of different agent counts share one compiled step via
    Scenario.pad_to; stats must reflect only the valid agents."""
    from gym_collision_avoidance_tpu.harness import experiments

    cfg = EnvConfig.evaluate(dtype="float32")
    sc2 = presets.two_agents_swap().pad_to(4)
    sc4 = presets.circle_scenario(4, radius=3.0, agent_radius=0.3)
    stats = experiments.run_batched_episodes([sc2, sc4], cfg, max_steps=256)
    assert stats[0]["num_agents"] == 2
    assert stats[1]["num_agents"] == 4
    assert stats[0]["time_to_goal"].shape == (2,)
    assert stats[0]["outcome"] in ("collision", "all_at_goal", "stuck")


def test_occupancy_grid_in_env_obs():
    import jax.numpy as jnp
    from gym_collision_avoidance_tpu.maps import grid as map_grid
    from gym_collision_avoidance_tpu.core.state import init_state
    from gym_collision_avoidance_tpu.env.step import env_reset
    from gym_collision_avoidance_tpu.obs import spec as obs_spec

    # occupancy_grid flows through sensors -> sensed dict -> obs key
    obs_spec._OBS_FNS.setdefault(
        "occupancy_grid", lambda s, c, sensed: sensed["occupancy_grid"]
    )
    cfg = EnvConfig(dtype="float32", use_static_map=True,
                    map_x_width=10.0, map_y_width=10.0)
    static = jnp.asarray(map_grid.load_static_map(
        cfg, "/root/reference/gym_collision_avoidance/envs/world_maps/002.png"))
    state = init_state(cfg, pos=np.zeros((2, 2)) + np.array([[0.5, 0.5], [-3, -3]]),
                       goal=np.ones((2, 2)) * 3,
                       radius=np.full(2, 0.3), pref_speed=np.ones(2))
    state, obs = env_reset(
        state, cfg, ("other_agents_states", "occupancy_grid"),
        ("dist_to_goal", "occupancy_grid"), static,
    )
    assert obs["occupancy_grid"].shape == (2, 50, 50)
    # agent near the central obstacle sees occupied cells; far corner agent
    # sees its companion's disc only
    assert int(np.asarray(obs["occupancy_grid"][0]).sum()) > 0


def test_autoreset_server_matches_direct_loop():
    """AutoresetServer must reproduce the raw vmap(autoreset-step) loop
    bitwise, dispatch boundaries included (chained dispatches are pure
    function composition — no state lives outside the carry)."""
    import jax
    import jax.numpy as jnp

    from gym_collision_avoidance_tpu import EnvConfig
    from gym_collision_avoidance_tpu.env import autoreset
    from gym_collision_avoidance_tpu.harness.serving import AutoresetServer
    from gym_collision_avoidance_tpu.policies import registry as P
    from gym_collision_avoidance_tpu.scenarios import random_cases

    cfg = EnvConfig(dtype="float32", done_mode="evaluate")
    pool = random_cases.scenario_pool(8, 3, seed=4, side_length=4.0)
    policy_id = np.full(3, P.NONCOOP, np.int32)
    E, S = 16, 10

    server = AutoresetServer(
        cfg, pool, policy_id, num_envs=E, steps_per_dispatch=S,
        collect=("dist_to_goal",),
    )
    outs = [server.dispatch() for _ in range(3)]  # 3 chained dispatches
    final = server.states()

    # direct reference loop: same construction, 30 plain steps
    astep = autoreset.make_autoreset_step(
        cfg, jnp.asarray(pool, jnp.float32), jnp.asarray(policy_id),
        (int(P.NONCOOP),),
    )
    states = jax.vmap(
        lambda i: autoreset.state_from_case(
            cfg, jnp.asarray(pool, jnp.float32)[i % 8],
            jnp.asarray(policy_id))
    )(jnp.arange(E))
    counters = jnp.arange(E, dtype=jnp.int32)
    d2g = []
    for _ in range(3 * S):
        states, counters, obs, rew, go = jax.vmap(astep)(states, counters)
        d2g.append(np.asarray(obs["dist_to_goal"]))

    np.testing.assert_array_equal(np.asarray(final.pos), np.asarray(states.pos))
    stacked = np.concatenate([np.asarray(o["dist_to_goal"]) for o in outs])
    np.testing.assert_array_equal(stacked, np.stack(d2g))
    assert server.episodes_completed() == int(
        jnp.sum(counters - jnp.arange(E)))


def test_autoreset_server_laserscan_guard_surfacing():
    """The laserscan fast-path exactness guard flows through the serving
    API (round-4 advisor finding): a conditionally-exact config must
    surface the in-graph flag per dispatch and cumulatively, and the
    bare autoreset builder must REFUSE the fast path without
    return_info (the guard would otherwise be silently dropped)."""
    import jax.numpy as jnp
    import pytest

    from gym_collision_avoidance_tpu import EnvConfig
    from gym_collision_avoidance_tpu.env import autoreset
    from gym_collision_avoidance_tpu.harness.serving import AutoresetServer
    from gym_collision_avoidance_tpu.maps import grid as map_grid
    from gym_collision_avoidance_tpu.policies import registry as P
    from gym_collision_avoidance_tpu.scenarios import random_cases

    cfg = EnvConfig(
        dtype="float32", done_mode="evaluate", use_static_map=True,
        map_x_width=20.0, map_y_width=20.0,
        laserscan_num_candidate_discs=3,
        # W=18: this pool draws radii up to 0.79 m, whose closed-form
        # span bound is 17 (the guard correctly TRIPPED at the bench's
        # W=12 in this test's first version — that path works too)
        laserscan_entry_window=18,
    )
    pool = random_cases.scenario_pool(4, 4, seed=1, side_length=4.0)
    policy_id = np.full(4, P.NONCOOP, np.int32)
    cells = jnp.asarray(
        map_grid.occupied_cell_list(map_grid.load_static_map(cfg, None))
    )

    # build-time refusal: fast-path knobs + laserscan + no return_info
    with pytest.raises(ValueError, match="laserscan_exactness_overflow"):
        autoreset.make_autoreset_step(
            cfg, pool, policy_id,
            sensors=("other_agents_states", "laserscan"),
            static_cells=cells,
        )

    server = AutoresetServer(
        cfg, pool, policy_id, num_envs=4, steps_per_dispatch=8,
        sensors=("other_agents_states", "laserscan"), static_cells=cells,
    )
    out = server.dispatch()
    assert out["exactness_overflow"].shape == (8,)  # per-step flag [S]
    assert not bool(out["exactness_overflow"].any())
    assert server.exactness_overflow() is False
    assert server.episodes_completed() >= 0
