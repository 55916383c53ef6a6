"""Other-agents-states sensor parity vs the reference sensor, including the
round(dist, 2) + lateral-position sort, horizon culling, and clipping."""

import numpy as np
import jax.numpy as jnp
import pytest

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.core import dynamics as dyn
from gym_collision_avoidance_tpu.core.state import init_state
from gym_collision_avoidance_tpu.obs import sensors

from tests.oracle import refsim


def _make_ref_agents(pos, goal, radius, vel):
    refsim.import_reference()
    from gym_collision_avoidance.envs.agent import Agent
    from gym_collision_avoidance.envs.policies.NonCooperativePolicy import (
        NonCooperativePolicy,
    )
    from gym_collision_avoidance.envs.dynamics.UnicycleDynamics import (
        UnicycleDynamics,
    )

    agents = []
    for i in range(pos.shape[0]):
        a = Agent(pos[i, 0], pos[i, 1], goal[i, 0], goal[i, 1], radius[i], 1.0,
                  None, NonCooperativePolicy, UnicycleDynamics, [], i)
        a.vel_global_frame = vel[i].astype(np.float64)
        a.dynamics_model.update_ego_frame()
        agents.append(a)
    return agents


def _make_state(cfg, pos, goal, radius, vel):
    state = init_state(cfg, pos=pos, goal=goal, radius=radius,
                       pref_speed=np.ones(pos.shape[0]))
    state = state.replace(vel=jnp.asarray(vel, state.pos.dtype))
    ref_prll, ref_orth, d2g, he, ve = dyn.update_ego_frame(
        state.pos, state.goal, state.heading, state.vel
    )
    return state.replace(ref_prll=ref_prll, ref_orth=ref_orth, dist_to_goal=d2g,
                         heading_ego_frame=he, vel_ego_frame=ve)


@pytest.mark.parametrize("sorting", ["closest_first", "closest_last", "time_to_impact"])
@pytest.mark.parametrize("horizon,max_observed", [(np.inf, 3), (np.inf, 2), (4.0, 3)])
def test_sensor_matches_reference(sorting, horizon, max_observed):
    refsim.import_reference()
    from gym_collision_avoidance.envs.sensors.OtherAgentsStatesSensor import (
        OtherAgentsStatesSensor,
    )
    from gym_collision_avoidance.envs import Config as RefConfig

    rng = np.random.RandomState(42)
    A = 5
    cfg = EnvConfig(dtype="float64", sensing_horizon=horizon,
                    max_num_other_agents_observed=max_observed,
                    agent_sorting_method=sorting)

    for trial in range(8):
        pos = rng.uniform(-5, 5, (A, 2))
        goal = rng.uniform(-5, 5, (A, 2))
        radius = rng.uniform(0.2, 0.8, A)
        vel = rng.uniform(-1.5, 1.5, (A, 2))

        agents = _make_ref_agents(pos, goal, radius, vel)
        # The reference sensor pads rows to Config.MAX_NUM_OTHER_AGENTS_OBSERVED
        # (a module global); patch it so shapes line up with max_observed.
        orig = RefConfig.MAX_NUM_OTHER_AGENTS_OBSERVED
        orig_h = RefConfig.SENSING_HORIZON
        try:
            RefConfig.MAX_NUM_OTHER_AGENTS_OBSERVED = max_observed
            RefConfig.SENSING_HORIZON = horizon
            sensor = OtherAgentsStatesSensor(
                max_num_other_agents_observed=max_observed,
                agent_sorting_method=sorting,
            )
            ref_rows = np.stack(
                [sensor.sense(agents, i, None) for i in range(A)]
            )
            ref_counts = np.array([a.num_other_agents_observed for a in agents])
            ref_closest = np.stack([a.other_agent_states for a in agents])
        finally:
            RefConfig.MAX_NUM_OTHER_AGENTS_OBSERVED = orig
            RefConfig.SENSING_HORIZON = orig_h

        state = _make_state(cfg, pos, goal, radius, vel)
        rows, closest, counts = sensors.other_agents_states(state, cfg)

        np.testing.assert_array_equal(np.asarray(counts), ref_counts,
                                      err_msg=f"trial {trial}")
        np.testing.assert_allclose(np.asarray(rows), ref_rows, atol=1e-9,
                                   err_msg=f"trial {trial}")
        np.testing.assert_allclose(np.asarray(closest), ref_closest, atol=1e-9)


def test_large_a_mxu_select_bitwise_matches_masked_sum(monkeypatch):
    """The sensor's MXU-dot row-select variant (disabled by default — a
    measured on-chip negative, see sensors.SENSOR_MXU_MIN_A) must stay
    bit-identical to the masked mul+sum path: single nonzero term per
    slot, operands exact at Precision.HIGHEST — same argument as the
    autoreset MXU pool pick."""
    from gym_collision_avoidance_tpu.core.state import init_state
    from gym_collision_avoidance_tpu.obs import sensors

    rng = np.random.RandomState(3)
    A = 20
    cfg = EnvConfig(dtype="float32", max_num_other_agents_observed=19,
                    agent_sorting_method="closest_last")
    state = init_state(
        cfg,
        pos=rng.uniform(-8, 8, (A, 2)),
        goal=rng.uniform(-8, 8, (A, 2)),
        radius=rng.uniform(0.2, 0.5, A),
        pref_speed=np.ones(A),
        heading=rng.uniform(-np.pi, np.pi, A),
    )
    out_sum = [np.asarray(x) for x in sensors.other_agents_states(state, cfg)]
    monkeypatch.setattr(sensors, "SENSOR_MXU_MIN_A", 1)
    out_dot = [np.asarray(x) for x in sensors.other_agents_states(state, cfg)]
    for a, b in zip(out_dot, out_sum):
        np.testing.assert_array_equal(a, b)
