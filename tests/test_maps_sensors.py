"""Map, laserscan, and occupancy-grid parity vs the reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.core.state import init_state
from gym_collision_avoidance_tpu.maps import grid as map_grid
from gym_collision_avoidance_tpu.obs import sensors

from tests.oracle import refsim

from gym_collision_avoidance_tpu.maps.grid import world_map_path

# vendored package copy, byte-identical to the reference's
# envs/world_maps/002.png (asserted in test_world_map_vendored)
MAP_PNG = world_map_path("002")


# The world_maps PNGs are 100x100; use a 10x10 m / 0.1 m map so neither side
# resizes (the reference's resize path calls the long-removed
# scipy.misc.imresize and would crash — a latent reference bug).
def _cfg():
    return EnvConfig(dtype="float64", use_static_map=True,
                     map_x_width=10.0, map_y_width=10.0)


def _ref_map(map_filename=None):
    refsim.import_reference()
    from gym_collision_avoidance.envs.Map import Map

    return Map(10, 10, 0.1, map_filename)


def _ref_agents(pos, radius, heading=None):
    refsim.import_reference()
    from gym_collision_avoidance.envs.agent import Agent
    from gym_collision_avoidance.envs import test_cases as tc

    agents = []
    for i in range(pos.shape[0]):
        h = None if heading is None else heading[i]
        a = Agent(pos[i, 0], pos[i, 1], pos[i, 0] + 5, pos[i, 1] + 5,
                  radius[i], 1.0, h, tc.policy_dict["noncoop"],
                  tc.dynamics_dict["unicycle"], [], i)
        agents.append(a)
    return agents


def test_static_map_load_matches_reference():
    ref = _ref_map(MAP_PNG)
    ours = map_grid.load_static_map(_cfg(), MAP_PNG)
    assert ours.shape == ref.static_map.shape
    np.testing.assert_array_equal(ours, ref.static_map)
    assert ours.any() and not ours.all()


def test_world_to_map_and_stamping_match():
    cfg = _cfg()
    ref_map = _ref_map(MAP_PNG)
    rng = np.random.RandomState(0)
    pos = rng.uniform(-6.5, 6.5, (6, 2))  # includes off-map agents
    radius = rng.uniform(0.2, 0.7, 6)

    agents = _ref_agents(pos, radius)
    ref_map.add_agents_to_map(agents)

    static = jnp.asarray(map_grid.load_static_map(cfg, MAP_PNG))
    ours = map_grid.stamp_agents(
        static, jnp.asarray(pos), jnp.asarray(radius), jnp.ones(6, bool), cfg
    )
    np.testing.assert_array_equal(np.asarray(ours), ref_map.map.astype(bool))

    # scalar transform parity
    for p in pos:
        (gi, gj), in_map = ref_map.world_coordinates_to_map_indices(p)
        i, j, im = map_grid.world_to_map(jnp.asarray(p), cfg, static.shape)
        assert (int(i), int(j), bool(im)) == (gi, gj, in_map)


def test_wall_collisions_match():
    cfg = _cfg()
    ref_map = _ref_map(MAP_PNG)
    ref_map.map = ref_map.static_map.copy()
    rng = np.random.RandomState(1)
    pos = rng.uniform(-5.5, 5.5, (20, 2))
    # map 002's only obstacle is a ~1 m block at the origin: park some
    # agents on and near it so both hit and miss cases occur.
    pos[:4] = [[0.0, 0.0], [0.6, 0.0], [-0.8, 0.3], [2.0, 2.0]]
    radius = rng.uniform(0.2, 0.7, 20)

    ref_hits = []
    for p, r in zip(pos, radius):
        (pi, pj), in_map = ref_map.world_coordinates_to_map_indices(p)
        mask = ref_map.get_agent_map_indices([pi, pj], r)
        ref_hits.append(bool(in_map and np.any(ref_map.static_map[mask])))

    static = jnp.asarray(map_grid.load_static_map(cfg, MAP_PNG))
    ours = map_grid.wall_collisions(
        static, jnp.asarray(pos), jnp.asarray(radius), jnp.ones(20, bool), cfg
    )
    np.testing.assert_array_equal(np.asarray(ours), np.array(ref_hits))
    assert any(ref_hits) and not all(ref_hits)


def test_world_map_vendored():
    # package self-containment: the vendored world maps are byte-identical
    # to the reference distribution's envs/world_maps/*.png
    import os

    ref_dir = "/root/reference/gym_collision_avoidance/envs/world_maps"
    for name in ("000", "001", "002"):
        p = world_map_path(name)
        assert os.path.exists(p)
        ref = os.path.join(ref_dir, name + ".png")
        if os.path.exists(ref):
            assert open(p, "rb").read() == open(ref, "rb").read()


def test_laserscan_matches_reference():
    refsim.import_reference()
    from gym_collision_avoidance.envs import Config as RefConfig
    from gym_collision_avoidance.envs.sensors.LaserScanSensor import LaserScanSensor

    cfg = _cfg()
    ref_map = _ref_map(MAP_PNG)
    rng = np.random.RandomState(2)
    pos = rng.uniform(-4, 4, (4, 2))
    pos[0] = [0.0, -2.0]  # looking at the central obstacle
    radius = rng.uniform(0.2, 0.5, 4)
    heading = rng.uniform(-np.pi, np.pi, 4)

    agents = _ref_agents(pos, radius, heading)
    for a, h in zip(agents, heading):
        a.heading_global_frame = h
    ref_map.add_agents_to_map(agents)

    orig = RefConfig.USE_STATIC_MAP
    RefConfig.USE_STATIC_MAP = True
    try:
        ref_scans = []
        for i in range(4):
            s = LaserScanSensor()
            ref_scans.append(s.sense(agents, i, ref_map)[0])  # first row
    finally:
        RefConfig.USE_STATIC_MAP = orig

    state = init_state(cfg, pos=pos, goal=pos + 5, radius=radius,
                       pref_speed=np.ones(4), heading=heading)
    static = jnp.asarray(map_grid.load_static_map(cfg, MAP_PNG))
    dynamic = map_grid.stamp_agents(static, state.pos, state.radius, state.valid, cfg)
    ours = np.asarray(sensors.laserscan(state, cfg, dynamic))
    np.testing.assert_allclose(ours, np.stack(ref_scans), atol=1e-9)
    assert (np.stack(ref_scans) < 6.0).any(), "scan should see something"


def test_occupancy_grid_matches_reference():
    refsim.import_reference()
    from gym_collision_avoidance.envs.sensors.OccupancyGridSensor import (
        OccupancyGridSensor,
    )
    from gym_collision_avoidance.envs import Config as RefConfig
    import gym_collision_avoidance.envs.sensors.OccupancyGridSensor as og_mod

    og_mod.Config = RefConfig  # module lacks the Config import (latent ref bug)

    cfg = _cfg()
    ref_map = _ref_map(MAP_PNG)
    rng = np.random.RandomState(3)
    pos = rng.uniform(-5.5, 5.5, (5, 2))
    radius = rng.uniform(0.2, 0.5, 5)
    agents = _ref_agents(pos, radius)
    ref_map.add_agents_to_map(agents)

    orig = RefConfig.USE_STATIC_MAP
    RefConfig.USE_STATIC_MAP = True
    try:
        ref_ogs = [OccupancyGridSensor().sense(agents, i, ref_map) for i in range(5)]
    finally:
        RefConfig.USE_STATIC_MAP = orig

    state = init_state(cfg, pos=pos, goal=pos + 5, radius=radius,
                       pref_speed=np.ones(5))
    static = jnp.asarray(map_grid.load_static_map(cfg, MAP_PNG))
    dynamic = map_grid.stamp_agents(static, state.pos, state.radius, state.valid, cfg)
    ours = np.asarray(sensors.occupancy_grid(state, cfg, dynamic))
    np.testing.assert_array_equal(ours, np.stack(ref_ogs).astype(bool))


def test_env_step_with_laserscan_and_walls():
    # End-to-end: laserscan obs + wall collision latching inside env_step.
    cfg = _cfg()
    static = jnp.asarray(map_grid.load_static_map(cfg, MAP_PNG))
    # agent 0 heads straight into a wall region; agent 1 roams free space
    state = init_state(cfg, pos=np.array([[-2.0, -2.0], [-4.0, -4.0]]),
                       goal=np.array([[2.0, 2.0], [-4.0, 2.0]]),
                       radius=np.array([0.3, 0.3]),
                       pref_speed=np.array([1.0, 1.0]))
    from gym_collision_avoidance_tpu.env.step import env_reset, env_step

    sensors_t = ("other_agents_states", "laserscan")
    obs_keys = ("dist_to_goal", "laserscan")
    state, obs = env_reset(state, cfg, sensors_t, obs_keys, static)
    assert obs["laserscan"].shape == (2, 3, 512)
    hit_wall = False
    for _ in range(60):
        state, obs, rew, go, info = env_step(
            state, None, cfg, None, (2,), sensors_t, obs_keys, static
        )
        if bool(state.in_collision[0]):
            hit_wall = True
            break
    assert hit_wall, "agent 0 should hit the wall"
    assert not bool(state.in_collision[1])


def test_laserscan_sparse_matches_gather_path():
    """The gather-free laserscan must be bit-identical to the dense path."""
    cfg = _cfg()
    static_np = map_grid.load_static_map(cfg, MAP_PNG)
    static = jnp.asarray(static_np)
    cells = jnp.asarray(map_grid.occupied_cell_list(static_np, max_cells=256))
    rng = np.random.RandomState(7)
    for trial in range(4):
        A = 6
        pos = rng.uniform(-4.5, 4.5, (A, 2))
        radius = rng.uniform(0.2, 0.5, A)
        heading = rng.uniform(-np.pi, np.pi, A)
        state = init_state(cfg, pos=pos, goal=pos + 3, radius=radius,
                           pref_speed=np.ones(A), heading=heading)
        dynamic = map_grid.stamp_agents(static, state.pos, state.radius,
                                        state.valid, cfg)
        dense = np.asarray(sensors.laserscan(state, cfg, dynamic))
        sparse = np.asarray(sensors.laserscan_sparse(state, cfg, cells))
        np.testing.assert_array_equal(dense, sparse, err_msg=f"trial {trial}")


def test_laserscan_wedge_culled_matches_full():
    """The per-beam-block disc-culled sparse path
    (cfg.laserscan_num_candidate_discs) must be bit-identical to the full
    sparse path whenever the conservative wedge screen's candidate counts
    stay <= C (laserscan_wedge_candidate_counts is the validity check)."""
    import dataclasses

    cfg = _cfg()
    static_np = map_grid.load_static_map(cfg, MAP_PNG)
    cells = jnp.asarray(map_grid.occupied_cell_list(static_np, max_cells=256))
    rng = np.random.RandomState(11)
    checked = 0
    for trial in range(8):
        A = 12
        pos = rng.uniform(-6.0, 6.0, (A, 2))
        radius = rng.uniform(0.2, 0.5, A)
        heading = rng.uniform(-np.pi, np.pi, A)
        state = init_state(cfg, pos=pos, goal=pos + 3, radius=radius,
                           pref_speed=np.ones(A), heading=heading)
        full = np.asarray(sensors.laserscan_sparse(state, cfg, cells))
        for C in (4, 6, 8):
            cfg_w = dataclasses.replace(cfg, laserscan_num_candidate_discs=C)
            culled = np.asarray(sensors.laserscan_sparse(state, cfg_w, cells))
            counts = np.asarray(
                sensors.laserscan_wedge_candidate_counts(state, cfg)
            )
            if counts.max() <= C:
                np.testing.assert_array_equal(
                    full, culled, err_msg=f"trial {trial} C={C}"
                )
                checked += 1
    # the screen must actually be selective enough for the equality branch
    # to have been exercised
    assert checked >= 8


def test_laserscan_windowed_matches_full():
    """The windowed first-two-hits sparse path
    (cfg.laserscan_entry_window) must be bit-identical to the full sparse
    path whenever laserscan_window_span (the validity check) does not
    exceed the configured window, both alone and composed with the wedge
    disc culling."""
    import dataclasses

    cfg = _cfg()
    static_np = map_grid.load_static_map(cfg, MAP_PNG)
    cells = jnp.asarray(map_grid.occupied_cell_list(static_np, max_cells=256))
    rng = np.random.RandomState(23)
    checked = 0
    for trial in range(4):
        A = 10
        pos = rng.uniform(-5.5, 5.5, (A, 2))
        radius = rng.uniform(0.15, 0.6, A)
        heading = rng.uniform(-np.pi, np.pi, A)
        state = init_state(cfg, pos=pos, goal=pos + 3, radius=radius,
                           pref_speed=np.ones(A), heading=heading)
        full = np.asarray(sensors.laserscan_sparse(state, cfg, cells))
        span = sensors.laserscan_window_span(state, cfg, cells)
        assert span <= 16, "slack analysis expects <= 16 for r <= 0.6 m"
        cfg_w = dataclasses.replace(cfg, laserscan_entry_window=16)
        win = np.asarray(sensors.laserscan_sparse(state, cfg_w, cells))
        np.testing.assert_array_equal(full, win, err_msg=f"trial {trial}")
        cfg_cw = dataclasses.replace(cfg, laserscan_entry_window=16,
                                     laserscan_num_candidate_discs=8)
        counts = np.asarray(
            sensors.laserscan_wedge_candidate_counts(state, cfg)
        )
        if counts.max() <= 8:
            cw = np.asarray(sensors.laserscan_sparse(state, cfg_cw, cells))
            np.testing.assert_array_equal(full, cw, err_msg=f"trial {trial}")
            checked += 1
    assert checked >= 2


def test_range_sample_table_matches_reference_arange():
    """The product-form range table must stay bitwise-equal to the
    reference's np.arange(0, 6, 0.1) in float64 (numpy fills arange as
    start + i*step, which is exactly the product form)."""
    ours = np.asarray(sensors._range_samples(jnp.float64))
    ref = np.arange(0.0, sensors.LASER_MAX_RANGE,
                    sensors.LASER_RANGE_RESOLUTION)
    assert ours.dtype == ref.dtype
    np.testing.assert_array_equal(ours, ref)
    assert sensors.LASER_NUM_RANGE_SAMPLES == len(ref)


def test_env_step_wedge_culled_trajectory_bit_identical():
    """Full env steps with cfg.laserscan_num_candidate_discs set must be
    bit-identical to the uncled config over a multi-step 20-agent
    trajectory (the bench configuration's correctness contract)."""
    import dataclasses

    import jax

    from gym_collision_avoidance_tpu.env.batch import batched_env_step
    from gym_collision_avoidance_tpu.models import ga3c_cadrl
    from gym_collision_avoidance_tpu.scenarios import presets

    cfg = EnvConfig(dtype="float32", max_num_other_agents_observed=19,
                    agent_sorting_method="closest_last", use_static_map=True,
                    map_x_width=20.0, map_y_width=20.0)
    cfg_w = dataclasses.replace(cfg, laserscan_num_candidate_discs=10)
    # the shipped bench config: wedge culling + entry windows together
    cfg_ww = dataclasses.replace(cfg, laserscan_num_candidate_discs=10,
                                 laserscan_entry_window=12)
    sc = presets.circle_scenario(20, radius=8.0, agent_radius=0.3,
                                 policy="GA3C_CADRL")
    params = {"ga3c_cadrl": ga3c_cadrl.load_params()}
    cells = jnp.asarray(map_grid.occupied_cell_list(
        map_grid.load_static_map(cfg, None)))
    E = 2
    state = sc.to_state(cfg)
    states = jax.tree.map(lambda x: jnp.broadcast_to(x, (E,) + x.shape), state)
    active = sc.active_policies
    sensors_t = ("other_agents_states", "laserscan")

    sf = sw = sww = states
    for t in range(40):
        sf, _o, _r, _g, _i = batched_env_step(
            sf, None, cfg, params, active, sensors_t, ("dist_to_goal",),
            None, cells)
        sw, _o, _r, _g, _i = batched_env_step(
            sw, None, cfg_w, params, active, sensors_t, ("dist_to_goal",),
            None, cells)
        sww, _o, _r, _g, _i = batched_env_step(
            sww, None, cfg_ww, params, active, sensors_t, ("dist_to_goal",),
            None, cells)
    for a, b, c in zip(jax.tree.leaves(sf), jax.tree.leaves(sw),
                       jax.tree.leaves(sww)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_env_step_sparse_laserscan_end_to_end():
    cfg = _cfg()
    static_np = map_grid.load_static_map(cfg, MAP_PNG)
    cells = jnp.asarray(map_grid.occupied_cell_list(static_np, max_cells=256))
    state = init_state(cfg, pos=np.array([[-2.0, -2.0], [-4.0, -4.0]]),
                       goal=np.array([[2.0, 2.0], [-4.0, 2.0]]),
                       radius=np.array([0.3, 0.3]),
                       pref_speed=np.array([1.0, 1.0]))
    from gym_collision_avoidance_tpu.env.step import env_reset, env_step

    sensors_t = ("other_agents_states", "laserscan")
    obs_keys = ("dist_to_goal", "laserscan")
    # no static_map needed at all on this path (walls off)
    state, obs = env_reset(state, cfg, sensors_t, obs_keys, None, cells)
    assert obs["laserscan"].shape == (2, 3, 512)
    state, obs, rew, go, info = env_step(
        state, None, cfg, None, (2,), sensors_t, obs_keys, None, cells
    )
    assert np.isfinite(np.asarray(obs["laserscan"])).all()


def test_laserscan_ego_subset_matches_full_rows():
    """Per-agent equipage (ego_idx) must reproduce exactly the equipped
    rows of the all-agents computation, on both laserscan paths."""
    cfg = _cfg()
    static_np = map_grid.load_static_map(cfg, MAP_PNG)
    static = jnp.asarray(static_np)
    cells = jnp.asarray(map_grid.occupied_cell_list(static_np, max_cells=256))
    rng = np.random.RandomState(11)
    A = 5
    pos = rng.uniform(-4.5, 4.5, (A, 2))
    radius = rng.uniform(0.2, 0.5, A)
    heading = rng.uniform(-np.pi, np.pi, A)
    state = init_state(cfg, pos=pos, goal=pos + 3, radius=radius,
                       pref_speed=np.ones(A), heading=heading)
    dynamic = map_grid.stamp_agents(static, state.pos, state.radius,
                                    state.valid, cfg)
    idx = (0, 3)
    full_d = np.asarray(sensors.laserscan(state, cfg, dynamic))
    sub_d = np.asarray(sensors.laserscan(state, cfg, dynamic, ego_idx=idx))
    np.testing.assert_array_equal(sub_d, full_d[list(idx)])
    full_s = np.asarray(sensors.laserscan_sparse(state, cfg, cells))
    sub_s = np.asarray(sensors.laserscan_sparse(state, cfg, cells, ego_idx=idx))
    np.testing.assert_array_equal(sub_s, full_s[list(idx)])


def test_per_agent_sensors_golden_vs_reference():
    """Mixed-equipage scenario (agent 0: laserscan + other-agents; agents
    1-2: other-agents only) must match the reference's per-Agent sensor
    wiring (envs/agent.py:31-33): equipped rows match the reference
    sensors, unequipped agents never touch their laserscan state."""
    refsim.import_reference()
    from gym_collision_avoidance.envs import Config as RefConfig
    from gym_collision_avoidance.envs import test_cases as tc
    from gym_collision_avoidance.envs.agent import Agent

    from gym_collision_avoidance_tpu.env import step as step_mod

    cfg = _cfg()
    rng = np.random.RandomState(21)
    A = 3
    radius = rng.uniform(0.2, 0.4, A)
    heading = rng.uniform(-np.pi, np.pi, A)
    positions = [rng.uniform(-3.5, 3.5, (A, 2)) for _ in range(3)]

    per_agent = [("laserscan", "other_agents_states"),
                 ("other_agents_states",), ("other_agents_states",)]
    orig = RefConfig.USE_STATIC_MAP
    RefConfig.USE_STATIC_MAP = True  # LaserScanSensor asserts this at init
    try:
        ref_agents = []
        for i in range(A):
            a = Agent(positions[0][i, 0], positions[0][i, 1],
                      positions[0][i, 0] + 5, positions[0][i, 1] + 5,
                      radius[i], 1.0, heading[i], tc.policy_dict["noncoop"],
                      tc.dynamics_dict["unicycle"],
                      [tc.sensor_dict[s] for s in per_agent[i]], i)
            ref_agents.append(a)
        ref_data = []
        for pos in positions:
            ref_map = _ref_map(MAP_PNG)
            for a, p in zip(ref_agents, pos):
                a.pos_global_frame = p.copy()
            ref_map.add_agents_to_map(ref_agents)
            for i, a in enumerate(ref_agents):
                a.sense(ref_agents, i, ref_map)
            ref_data.append({i: dict(a.sensor_data)
                             for i, a in enumerate(ref_agents)})
    finally:
        RefConfig.USE_STATIC_MAP = orig

    static = jnp.asarray(map_grid.load_static_map(cfg, MAP_PNG))
    state = init_state(cfg, pos=positions[0], goal=positions[0] + 5,
                       radius=radius, pref_speed=np.ones(A), heading=heading)
    sensors_spec = (("laserscan", (0,)), "other_agents_states")
    for step, pos in enumerate(positions):
        state = state.replace(pos=jnp.asarray(pos))
        state, obs, _si = step_mod._sense_and_observe(
            state, cfg, sensors_spec,
            ("laserscan", "other_agents_states"), static,
        )
        # equipped laserscan row matches the reference sensor's history
        np.testing.assert_allclose(
            np.asarray(state.laserscan_history[0]),
            np.asarray(ref_data[step][0]["laserscan"]), atol=1e-9)
        # other-agents rows match for every agent (all equipped)
        for i in range(A):
            np.testing.assert_allclose(
                np.asarray(obs["other_agents_states"][i]),
                np.asarray(ref_data[step][i]["other_agents_states"]),
                atol=1e-12)
        # unequipped agents never sense: count stays 0, history untouched
        assert int(state.laserscan_count[0]) == step + 1
        assert int(state.laserscan_count[1]) == 0
        assert int(state.laserscan_count[2]) == 0


def test_laserscan_history_roll_matches_reference():
    """Multi-step history semantics (LaserScanSensor.py:84-90): the stacked
    scans must roll the same way as the reference's stateful sensor while
    the agent moves."""
    refsim.import_reference()
    from gym_collision_avoidance.envs import Config as RefConfig
    from gym_collision_avoidance.envs.sensors.LaserScanSensor import LaserScanSensor

    from gym_collision_avoidance_tpu.env import step as step_mod

    cfg = _cfg()
    rng = np.random.RandomState(5)
    radius = rng.uniform(0.2, 0.4, 2)
    heading = np.array([0.3, -2.0])
    positions = [
        np.array([[0.0, -2.0], [1.5, 0.5]]),
        np.array([[0.3, -1.6], [1.2, 0.6]]),
        np.array([[0.7, -1.1], [0.9, 0.8]]),
    ]

    orig = RefConfig.USE_STATIC_MAP
    RefConfig.USE_STATIC_MAP = True
    try:
        s = LaserScanSensor()
        for pos in positions:
            ref_map = _ref_map(MAP_PNG)
            agents = _ref_agents(pos, radius, heading)
            for a, h in zip(agents, heading):
                a.heading_global_frame = h
            ref_map.add_agents_to_map(agents)
            ref_hist = s.sense(agents, 0, ref_map)
    finally:
        RefConfig.USE_STATIC_MAP = orig

    static = jnp.asarray(map_grid.load_static_map(cfg, MAP_PNG))
    state = init_state(cfg, pos=positions[0], goal=positions[0] + 5,
                       radius=radius, pref_speed=np.ones(2), heading=heading)
    for pos in positions:
        state = state.replace(pos=jnp.asarray(pos))
        state, obs, _si = step_mod._sense_and_observe(
            state, cfg, ("laserscan",), ("laserscan",), static
        )
    np.testing.assert_allclose(
        np.asarray(state.laserscan_history)[0], np.asarray(ref_hist), atol=1e-9
    )
    # the three slots must differ (the agent moved between scans)
    h = np.asarray(state.laserscan_history)[0]
    assert not np.array_equal(h[0], h[2])


def test_laserscan_window_overflow_guard():
    """The in-graph exactness guard (laserscan_sparse(return_overflow=True))
    must agree with the offline laserscan_window_span diagnostic on the
    non-wedge windowed path: flag False iff the measured span fits the
    window — and a too-small window may never silently return ranges, the
    flag must trip."""
    import dataclasses

    cfg = _cfg()
    static_np = map_grid.load_static_map(cfg, MAP_PNG)
    cells = jnp.asarray(map_grid.occupied_cell_list(static_np, max_cells=256))
    rng = np.random.RandomState(37)
    tripped = cleared = 0
    for trial in range(6):
        A = 10
        pos = rng.uniform(-5.5, 5.5, (A, 2))
        radius = rng.uniform(0.15, 0.6, A)
        heading = rng.uniform(-np.pi, np.pi, A)
        state = init_state(cfg, pos=pos, goal=pos + 3, radius=radius,
                           pref_speed=np.ones(A), heading=heading)
        span = sensors.laserscan_window_span(state, cfg, cells)
        full = np.asarray(sensors.laserscan_sparse(state, cfg, cells))
        for W in (max(2, span - 4), span, span + 2):
            cfg_w = dataclasses.replace(cfg, laserscan_entry_window=W)
            win, ovf = sensors.laserscan_sparse(state, cfg_w, cells,
                                                return_overflow=True)
            assert bool(ovf) == (span > W), (
                f"trial {trial} W={W}: guard={bool(ovf)} but span={span}"
            )
            if span <= W:
                np.testing.assert_array_equal(full, np.asarray(win))
                cleared += 1
            else:
                tripped += 1
    # both branches must have been exercised
    assert tripped >= 4 and cleared >= 6


def test_laserscan_wedge_overflow_guard():
    """The wedge-compaction slot-overflow guard must trip whenever some
    (ego, block) has more screened candidates than C slots — the in-graph
    twin of laserscan_wedge_candidate_counts."""
    import dataclasses

    cfg = _cfg()
    static_np = map_grid.load_static_map(cfg, MAP_PNG)
    cells = jnp.asarray(map_grid.occupied_cell_list(static_np, max_cells=256))
    rng = np.random.RandomState(41)
    tripped = cleared = 0
    for trial in range(6):
        A = 12
        pos = rng.uniform(-3.0, 3.0, (A, 2))  # crowded: high wedge counts
        radius = rng.uniform(0.2, 0.5, A)
        heading = rng.uniform(-np.pi, np.pi, A)
        state = init_state(cfg, pos=pos, goal=pos + 3, radius=radius,
                           pref_speed=np.ones(A), heading=heading)
        counts = np.asarray(
            sensors.laserscan_wedge_candidate_counts(state, cfg)
        )
        full = np.asarray(sensors.laserscan_sparse(state, cfg, cells))
        for C in (2, 4, 8):
            if C >= A - 1:
                continue
            cfg_c = dataclasses.replace(cfg, laserscan_num_candidate_discs=C)
            culled, ovf = sensors.laserscan_sparse(state, cfg_c, cells,
                                                   return_overflow=True)
            assert bool(ovf) == (counts.max() > C), (
                f"trial {trial} C={C}: guard={bool(ovf)} counts_max="
                f"{counts.max()}"
            )
            if counts.max() <= C:
                np.testing.assert_array_equal(full, np.asarray(culled))
                cleared += 1
            else:
                tripped += 1
    assert tripped >= 3 and cleared >= 3


def test_env_step_surfaces_laserscan_overflow_flag():
    """env_step's info dict must carry the exactness flag whenever a
    conditional laserscan fast path is configured."""
    import dataclasses

    from gym_collision_avoidance_tpu.env.step import env_step
    from gym_collision_avoidance_tpu.policies import registry as policies

    cfg = dataclasses.replace(_cfg(), laserscan_entry_window=16)
    static_np = map_grid.load_static_map(cfg, MAP_PNG)
    cells = jnp.asarray(map_grid.occupied_cell_list(static_np, max_cells=256))
    A = 4
    rng = np.random.RandomState(5)
    pos = rng.uniform(-4.0, 4.0, (A, 2))
    state = init_state(cfg, pos=pos, goal=pos + 3,
                       radius=np.full(A, 0.3), pref_speed=np.ones(A),
                       heading=np.zeros(A))
    _st, _obs, _rew, _go, info = env_step(
        state, None, cfg, None, (policies.NONCOOP,),
        ("laserscan", "other_agents_states"), ("dist_to_goal",),
        static_map=None, static_cells=cells,
    )
    assert "laserscan_exactness_overflow" in info
    assert not bool(info["laserscan_exactness_overflow"])
