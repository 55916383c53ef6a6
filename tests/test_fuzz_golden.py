"""Property/fuzz golden tests: random HETEROGENEOUS scenarios must match
the reference simulator bit for bit.

Round 2 added per-agent policy mixes, per-agent dynamics selection and
per-agent sensor equipage, each golden-tested on fixed cases.  This
module fuzzes those heterogeneity surfaces jointly: seeded random
scenarios with random agent counts, random policy/dynamics mixes and
random geometry, stepped 50 steps in float64 strict-parity mode and
asserted with ``assert_array_equal`` (zero tolerance) against the
reference oracle (per-Agent wiring: envs/agent.py:31-33; random case
construction: envs/test_cases.py:89-96).

Round 4 extends the fuzz to the hard surfaces: random mixes drawing the
NN policies (CADRL lookahead, GA3C-CADRL LSTM) and RVO (via the
C++-oracle-backed rvo2 shim, so the reference's own RVOPolicy is the
oracle) — discrete outcomes exact, continuous state at the fixed-case
NN goldens' 5e-4 floor — and random per-agent sensor equipage on a
static map (bitwise incl. the full laserscan history).

All scenarios are padded to 4 agents (``Scenario.pad_to``) so every seed
shares ONE compiled program — the padding itself is part of what's under
test (parked invalid agents must never perturb real ones).
"""

import numpy as np
import pytest

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.core import dynamics as dyn
from gym_collision_avoidance_tpu.env.step import env_reset
from gym_collision_avoidance_tpu.harness import runner
from gym_collision_avoidance_tpu.maps.grid import world_map_path
from gym_collision_avoidance_tpu.policies import registry as policies
from gym_collision_avoidance_tpu.scenarios import presets

from tests.oracle import refsim

PARITY_CFG = EnvConfig(dtype="float64", done_mode="learning", strict_parity=True)
MAX_A = 4          # reference default Config: MAX_NUM_AGENTS_IN_ENVIRONMENT=4
NUM_STEPS = 50
SEEDS = list(range(24))

_POLICY_NAMES = {policies.NONCOOP: "noncoop", policies.STATIC: "static"}


def _random_mix(seed):
    """One seeded random heterogeneous scenario description."""
    rng = np.random.RandomState(4000 + seed)
    A = int(rng.randint(2, MAX_A + 1))
    radius = rng.uniform(0.2, 0.5, A)
    pref_speed = rng.uniform(0.5, 1.2, A)
    heading = rng.uniform(-np.pi, np.pi, A)
    # rejection-sample starts so nobody begins in collision
    pos = np.zeros((A, 2))
    for i in range(A):
        while True:
            p = rng.uniform(-4.0, 4.0, 2)
            if all(
                np.linalg.norm(p - pos[j]) > radius[i] + radius[j] + 0.2
                for j in range(i)
            ):
                pos[i] = p
                break
    # The reference preallocates per-agent history as
    # int(1.2 * MAX_TIME_RATIO * (dist-0.2)/pref_speed / dt) rows
    # (envs/agent.py:100-117) and CRASHES if an episode outlives it, so
    # goals too close to starts are unrepresentable there (its own
    # generator enforces a min distance too).  Keep the buffer > NUM_STEPS.
    goal = np.zeros((A, 2))
    for i in range(A):
        min_dist = 0.2 + pref_speed[i] * (NUM_STEPS + 4) * 0.2 / 2.4
        while True:
            g = rng.uniform(-4.0, 4.0, 2)
            if np.linalg.norm(g - pos[i]) > min_dist:
                goal[i] = g
                break
    # random policy mix with at least one mover
    policy_id = rng.choice([policies.NONCOOP, policies.STATIC], A)
    policy_id[rng.randint(A)] = policies.NONCOOP
    dynamics_id = rng.choice([dyn.UNICYCLE, dyn.UNICYCLE_MAX_TURN_RATE], A)
    return pos, goal, radius, pref_speed, heading, policy_id, dynamics_id


def _ref_rollout(pos, goal, radius, pref_speed, heading, policy_id, dynamics_id):
    refsim.import_reference()
    from gym_collision_avoidance.envs import test_cases as tc
    from gym_collision_avoidance.envs.agent import Agent
    from gym_collision_avoidance.envs.collision_avoidance_env import (
        CollisionAvoidanceEnv,
    )
    from gym_collision_avoidance.envs.dynamics.UnicycleDynamics import (
        UnicycleDynamics,
    )
    from gym_collision_avoidance.envs.dynamics.UnicycleDynamicsMaxTurnRate import (
        UnicycleDynamicsMaxTurnRate,
    )

    dyn_classes = {
        dyn.UNICYCLE: UnicycleDynamics,
        dyn.UNICYCLE_MAX_TURN_RATE: UnicycleDynamicsMaxTurnRate,
    }
    env = CollisionAvoidanceEnv()
    agents = [
        Agent(
            pos[i, 0], pos[i, 1], goal[i, 0], goal[i, 1], radius[i],
            pref_speed[i],
            # np.float64 heading: a python float would demote the
            # reference trig chain to f32 (test_golden_vs_reference.py)
            np.float64(heading[i]),
            tc.policy_dict[_POLICY_NAMES[int(policy_id[i])]],
            dyn_classes[int(dynamics_id[i])],
            [tc.sensor_dict["other_agents_states"]], i,
        )
        for i in range(pos.shape[0])
    ]
    env.set_agents(agents)
    env.reset()
    return refsim.rollout(env, NUM_STEPS)


def _jax_rollout(pos, goal, radius, pref_speed, heading, policy_id, dynamics_id):
    sc = presets.Scenario(
        pos=pos, goal=goal, pref_speed=pref_speed, radius=radius,
        heading=heading, policy_id=policy_id.astype(np.int32),
        dynamics_id=dynamics_id.astype(np.int32),
    ).pad_to(MAX_A)
    state = sc.to_state(PARITY_CFG)
    state, _ = env_reset(state, PARITY_CFG)
    # fixed policy set -> one compiled program across all fuzz seeds
    _, traj = runner.rollout(
        state, PARITY_CFG, NUM_STEPS,
        active_policies=(policies.STATIC, policies.NONCOOP),
        collect_obs=True,
    )
    return {
        k: np.asarray(v) if k != "obs"
        else {kk: np.asarray(vv) for kk, vv in v.items()}
        for k, v in traj.items()
    }


# ---------------------------------------------------------------------------
# The hard heterogeneity surface: NN policies (CADRL value-net lookahead,
# GA3C-CADRL LSTM) and RVO drawn into random mixed-policy scenarios, and
# random per-agent sensor equipage.  RVO runs in the reference via the
# C++-oracle-backed rvo2 shim (tests/oracle/rvo2_shim.py — the real
# submodule is unbuilt in this image), so the reference's own RVOPolicy
# wrapper code is the oracle; its kernel floor vs our JAX ORCA is 1e-9
# (tests/test_orca.py), far under the NN mixes' 5e-4 tolerance.
# ---------------------------------------------------------------------------

NN_SEEDS = list(range(8))
NN_STEPS = 40
MAP_PNG = world_map_path("002")   # vendored copy of envs/world_maps/002.png

# Mirrors test_ga3c._ga3c_cfg: the GA3C net consumes the sensor obs, so the
# env-level sorting/slot settings must match the checkpoint's registry
# entry (closest_last, 19 slots — env_utils.py:469).  CADRL ignores the
# sensor obs (it re-encodes agents internally, CADRLPolicy.py:50-69), so
# one shared env config serves the whole mix.
NN_CFG = EnvConfig(
    dtype="float64", done_mode="learning", strict_parity=True,
    max_num_other_agents_observed=19, agent_sorting_method="closest_last",
)


def _random_nn_mix(seed):
    """Seeded random scenario with >=1 NN-policy agent in the mix."""
    rng = np.random.RandomState(7000 + seed)
    A = int(rng.randint(2, MAX_A + 1))
    radius = rng.uniform(0.2, 0.5, A)
    pref_speed = rng.uniform(0.5, 1.2, A)
    heading = rng.uniform(-np.pi, np.pi, A)
    pos = np.zeros((A, 2))
    for i in range(A):
        while True:
            p = rng.uniform(-4.0, 4.0, 2)
            if all(
                np.linalg.norm(p - pos[j]) > radius[i] + radius[j] + 0.2
                for j in range(i)
            ):
                pos[i] = p
                break
    goal = np.zeros((A, 2))
    for i in range(A):
        min_dist = 0.2 + pref_speed[i] * (NN_STEPS + 4) * 0.2 / 2.4
        while True:
            g = rng.uniform(-4.0, 4.0, 2)
            if np.linalg.norm(g - pos[i]) > min_dist:
                goal[i] = g
                break
    choices = [policies.NONCOOP, policies.STATIC, policies.CADRL,
               policies.GA3C_CADRL, policies.RVO]
    policy_id = rng.choice(choices, A)
    # guarantee the hard surface: at least one NN/RVO agent every seed
    policy_id[rng.randint(A)] = rng.choice(
        [policies.CADRL, policies.GA3C_CADRL, policies.RVO]
    )
    return pos, goal, radius, pref_speed, heading, policy_id


@pytest.fixture(scope="module")
def ref_nn_policies():
    """One shared reference policy instance per NN type (both are
    stateless across agents; reloading the TF graph per agent per seed
    would dominate the suite's runtime)."""
    refsim.import_reference()
    from gym_collision_avoidance.envs.policies.CADRLPolicy import CADRLPolicy
    from gym_collision_avoidance.envs.policies.GA3CCADRLPolicy import (
        GA3CCADRLPolicy,
    )

    ga3c = GA3CCADRLPolicy()
    ga3c.initialize_network(
        checkpt_dir="IROS18", checkpt_name="network_01900000"
    )
    return {policies.CADRL: CADRLPolicy(), policies.GA3C_CADRL: ga3c}


def _ref_rollout_nn(mix, ref_nn_policies):
    pos, goal, radius, pref_speed, heading, policy_id = mix
    refsim.import_reference()
    from gym_collision_avoidance.envs import test_cases as tc
    from gym_collision_avoidance.envs.agent import Agent
    from gym_collision_avoidance.envs.collision_avoidance_env import (
        CollisionAvoidanceEnv,
    )
    from gym_collision_avoidance.envs.dynamics.UnicycleDynamics import (
        UnicycleDynamics,
    )

    env = CollisionAvoidanceEnv()
    # RVO is instantiated per agent (its private rvo2 sim binds the agent
    # count on first use); the heavyweight NN policies use the shared
    # fixture instances
    per_agent_names = dict(_POLICY_NAMES)
    per_agent_names[int(policies.RVO)] = "RVO"
    agents = []
    for i in range(pos.shape[0]):
        pid = int(policy_id[i])
        name = per_agent_names.get(pid)
        a = Agent(
            pos[i, 0], pos[i, 1], goal[i, 0], goal[i, 1], radius[i],
            pref_speed[i], np.float64(heading[i]),
            tc.policy_dict[name] if name else type(ref_nn_policies[pid]),
            UnicycleDynamics,
            [tc.sensor_dict["other_agents_states"]], i,
        )
        if name is None:
            a.policy = ref_nn_policies[pid]
        a.sensors[0].set_args(
            {"agent_sorting_method": "closest_last",
             "max_num_other_agents_observed": 19}
        )
        agents.append(a)
    env.set_agents(agents)
    env.reset()
    return refsim.rollout(env, NN_STEPS)


@pytest.mark.parametrize("seed", NN_SEEDS)
def test_random_nn_policy_mix_matches_reference(seed, ref_nn_policies):
    """Mixed CADRL / GA3C-CADRL / RVO / scripted scenarios vs the reference.

    Discrete outcomes (goal/collision/timeout latches) must match exactly;
    continuous state carries the same 5e-4 tolerance as the fixed-case NN
    goldens (test_ga3c/test_cadrl) — the floor is the TF1-vs-JAX forward
    reproducibility (~2e-5 in probs), not the env.
    """
    mix = _random_nn_mix(seed)
    pos, goal, radius, pref_speed, heading, policy_id = mix
    A = pos.shape[0]
    ref = _ref_rollout_nn(mix, ref_nn_policies)

    from gym_collision_avoidance_tpu.models import cadrl as cadrl_net
    from gym_collision_avoidance_tpu.models import ga3c_cadrl

    sc = presets.Scenario(
        pos=pos, goal=goal, pref_speed=pref_speed, radius=radius,
        heading=heading, policy_id=policy_id.astype(np.int32),
        dynamics_id=np.full(A, dyn.UNICYCLE, np.int32),
    ).pad_to(MAX_A)
    state, _ = env_reset(sc.to_state(NN_CFG), NN_CFG)
    params = {
        "cadrl": cadrl_net.load_params(),
        "ga3c_cadrl": ga3c_cadrl.load_params(),
    }
    _, traj = runner.rollout(
        state, NN_CFG, NN_STEPS, params=params,
        active_policies=(policies.STATIC, policies.NONCOOP, policies.CADRL,
                         policies.GA3C_CADRL, policies.RVO),
    )

    for key in ("is_at_goal", "in_collision", "ran_out_of_time"):
        np.testing.assert_array_equal(
            np.asarray(traj[key])[:, :A], ref[key], err_msg=f"seed{seed}:{key}"
        )
    for key in ("pos", "vel", "heading"):
        np.testing.assert_allclose(
            np.asarray(traj[key])[:, :A], ref[key], atol=5e-4,
            err_msg=f"seed{seed}:{key}",
        )
    np.testing.assert_allclose(
        np.asarray(traj["rewards"])[:, :A], ref["rewards"], atol=1e-3,
        err_msg=f"seed{seed}:rewards",
    )


EQUIP_SEEDS = list(range(8))
EQUIP_STEPS = 50
# The reference env hard-codes a 16x16 m / 0.1 m map (collision_avoidance_
# env.py:384-392) and its resize path calls the long-removed
# scipy.misc.imresize — so feed both sides a pre-resized 160x160 PNG.
EQUIP_CFG = EnvConfig(
    dtype="float64", done_mode="learning", strict_parity=True,
    use_static_map=True, map_x_width=16.0, map_y_width=16.0,
)


@pytest.fixture(scope="module")
def equip_map_png(tmp_path_factory):
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(MAP_PNG))
    idx = (np.arange(160) * img.shape[0] // 160).astype(int)
    resized = img[np.ix_(idx, idx)]
    path = str(tmp_path_factory.mktemp("maps") / "002_160.png")
    imageio.imwrite(path, resized)
    return path


def _random_equipage(seed):
    """Seeded random scenario with random per-agent sensor subsets."""
    rng = np.random.RandomState(9000 + seed)
    A = int(rng.randint(2, MAX_A + 1))
    radius = rng.uniform(0.2, 0.4, A)
    pref_speed = rng.uniform(0.5, 1.2, A)
    heading = rng.uniform(-np.pi, np.pi, A)
    pos = np.zeros((A, 2))
    for i in range(A):
        while True:
            p = rng.uniform(-3.5, 3.5, 2)
            if all(
                np.linalg.norm(p - pos[j]) > radius[i] + radius[j] + 0.2
                for j in range(i)
            ):
                pos[i] = p
                break
    goal = np.zeros((A, 2))
    for i in range(A):
        min_dist = 0.2 + pref_speed[i] * (EQUIP_STEPS + 4) * 0.2 / 2.4
        while True:
            g = rng.uniform(-3.5, 3.5, 2)
            if np.linalg.norm(g - pos[i]) > min_dist:
                goal[i] = g
                break
    policy_id = rng.choice([policies.NONCOOP, policies.STATIC], A)
    policy_id[rng.randint(A)] = policies.NONCOOP
    # random per-agent equipage; force >=1 laserscan carrier so the map
    # sensing path is always exercised
    has_oas = rng.rand(A) < 0.7
    has_laser = rng.rand(A) < 0.5
    has_laser[rng.randint(A)] = True
    return (pos, goal, radius, pref_speed, heading, policy_id,
            has_oas, has_laser)


def _ref_rollout_equipage(mix, map_png):
    pos, goal, radius, pref_speed, heading, policy_id, has_oas, has_laser = mix
    refsim.import_reference()
    from gym_collision_avoidance.envs import Config as RefConfig
    from gym_collision_avoidance.envs import test_cases as tc
    from gym_collision_avoidance.envs.agent import Agent
    from gym_collision_avoidance.envs.collision_avoidance_env import (
        CollisionAvoidanceEnv,
    )
    from gym_collision_avoidance.envs.dynamics.UnicycleDynamics import (
        UnicycleDynamics,
    )

    orig_map, orig_obs = RefConfig.USE_STATIC_MAP, RefConfig.STATES_IN_OBS
    RefConfig.USE_STATIC_MAP = True
    RefConfig.STATES_IN_OBS = list(orig_obs) + ["laserscan"]
    try:
        env = CollisionAvoidanceEnv()
        env.set_static_map(map_png)
        agents = []
        for i in range(pos.shape[0]):
            names = [n for n, has in
                     (("other_agents_states", has_oas[i]),
                      ("laserscan", has_laser[i])) if has]
            agents.append(Agent(
                pos[i, 0], pos[i, 1], goal[i, 0], goal[i, 1], radius[i],
                pref_speed[i], np.float64(heading[i]),
                tc.policy_dict[_POLICY_NAMES[int(policy_id[i])]],
                UnicycleDynamics, [tc.sensor_dict[n] for n in names], i,
            ))
        env.set_agents(agents)
        env.reset()
        return refsim.rollout(env, EQUIP_STEPS)
    finally:
        RefConfig.USE_STATIC_MAP = orig_map
        RefConfig.STATES_IN_OBS = orig_obs


@pytest.mark.parametrize("seed", EQUIP_SEEDS)
def test_random_sensor_equipage_matches_reference(seed, equip_map_png):
    """Random per-agent sensor subsets on a static map vs the reference,
    bit for bit (envs/agent.py:31-33 per-Agent sensor lists; wall
    collisions and the stamped-agents laserscan included)."""
    import jax.numpy as jnp

    from gym_collision_avoidance_tpu.env.step import env_step
    from gym_collision_avoidance_tpu.maps import grid as map_grid

    mix = _random_equipage(seed)
    pos, goal, radius, pref_speed, heading, policy_id, has_oas, has_laser = mix
    A = pos.shape[0]
    ref = _ref_rollout_equipage(mix, equip_map_png)

    sc = presets.Scenario(
        pos=pos, goal=goal, pref_speed=pref_speed, radius=radius,
        heading=heading, policy_id=policy_id.astype(np.int32),
        dynamics_id=np.full(A, dyn.UNICYCLE, np.int32),
    ).pad_to(MAX_A)
    state = sc.to_state(EQUIP_CFG)
    static = jnp.asarray(map_grid.load_static_map(EQUIP_CFG, equip_map_png))
    sensors_t = (
        ("other_agents_states", tuple(np.flatnonzero(has_oas))),
        ("laserscan", tuple(np.flatnonzero(has_laser))),
    )
    obs_keys = ("dist_to_goal", "heading_ego_frame", "other_agents_states",
                "laserscan")
    state, _ = env_reset(state, EQUIP_CFG, sensors_t, obs_keys, static)
    for t in range(EQUIP_STEPS):
        state, obs, rewards, game_over, _ = env_step(
            state, None, EQUIP_CFG, None,
            (policies.STATIC, policies.NONCOOP), sensors_t, obs_keys, static,
        )
        np.testing.assert_array_equal(
            np.asarray(state.pos)[:A], ref["pos"][t], err_msg=f"t{t}:pos"
        )
        np.testing.assert_array_equal(
            np.asarray(rewards)[:A], ref["rewards"][t], err_msg=f"t{t}:rew"
        )
        np.testing.assert_array_equal(
            np.asarray(state.in_collision)[:A], ref["in_collision"][t],
            err_msg=f"t{t}:coll",
        )
        np.testing.assert_array_equal(
            np.asarray(state.is_at_goal)[:A], ref["is_at_goal"][t],
            err_msg=f"t{t}:goal",
        )
        for i in range(A):
            ref_obs_i = ref["obs"][t][i]
            if has_oas[i]:
                # same 1e-14 floor as the base fuzz's oas assert: the
                # ego-frame projection can differ by 1 ulp on some
                # geometries
                np.testing.assert_allclose(
                    np.asarray(obs["other_agents_states"])[i],
                    ref_obs_i["other_agents_states"], atol=1e-14,
                    err_msg=f"t{t}a{i}:oas",
                )
            else:
                # unequipped: the reference obs is an eval'd None reading
                # (get_sensor_data -> None); ours keeps zeros
                assert ref_obs_i["other_agents_states"].shape == ()
                assert (np.asarray(obs["other_agents_states"])[i] == 0).all()
            if has_laser[i]:
                np.testing.assert_array_equal(
                    np.asarray(obs["laserscan"])[i], ref_obs_i["laserscan"],
                    err_msg=f"t{t}a{i}:laser",
                )
            else:
                # unequipped: the reference evals a None sensor reading
                # (agent.get_sensor_data -> None); ours keeps the state's
                # zero-initialized scan history
                assert ref_obs_i["laserscan"].shape == () or (
                    ref_obs_i["laserscan"] == None  # noqa: E711
                ).all()
                assert (np.asarray(obs["laserscan"])[i] == 0).all()


@pytest.mark.parametrize("seed", SEEDS)
def test_random_heterogeneous_mix_matches_reference(seed):
    mix = _random_mix(seed)
    A = mix[0].shape[0]
    ref = _ref_rollout(*mix)
    traj = _jax_rollout(*mix)

    for key in ("pos", "vel", "heading", "rewards", "is_at_goal",
                "in_collision", "ran_out_of_time"):
        np.testing.assert_array_equal(traj[key][:, :A], ref[key], err_msg=key)

    # observation parity for every real agent at every step (the sensor
    # pipeline must ignore the parked padding agents entirely)
    obs = traj["obs"]
    for t in range(NUM_STEPS):
        for i in range(A):
            np.testing.assert_array_equal(
                obs["dist_to_goal"][t, i], ref["obs"][t][i]["dist_to_goal"]
            )
            np.testing.assert_array_equal(
                obs["heading_ego_frame"][t, i],
                ref["obs"][t][i]["heading_ego_frame"],
            )
            np.testing.assert_allclose(
                obs["other_agents_states"][t, i],
                ref["obs"][t][i]["other_agents_states"], atol=1e-14,
            )
