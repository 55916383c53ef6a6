"""ORCA: JAX kernel vs the C++ oracle, plus env-level RVO behavior."""

import numpy as np
import jax.numpy as jnp
import pytest

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.harness import runner
from gym_collision_avoidance_tpu.ops import orca
from gym_collision_avoidance_tpu.scenarios import presets
from gym_collision_avoidance_tpu.utils import native_build

from tests.oracle import refsim


@pytest.fixture(scope="module")
def cpp_orca():
    return native_build.load_orca()


def _random_world(rng, A, crowded=False):
    span = 2.0 if crowded else 8.0
    pos = rng.uniform(-span, span, (A, 2))
    vel = rng.uniform(-1.0, 1.0, (A, 2))
    goal = rng.uniform(-span, span, (A, 2))
    radius = rng.uniform(0.2, 0.6, A)
    pref_speed = rng.uniform(0.5, 1.5, A)
    d = goal - pos
    pref_vel = pref_speed[:, None] * d / np.maximum(
        np.linalg.norm(d, axis=1, keepdims=True), 1e-12
    )
    return pos, vel, pref_vel, radius, pref_speed


@pytest.mark.parametrize("A,crowded", [(2, False), (4, False), (8, False),
                                       (4, True), (10, True), (20, True)])
def test_orca_matches_cpp_oracle(cpp_orca, A, crowded):
    rng = np.random.RandomState(17 + A + int(crowded))
    dt, horizon = 0.2, 5.0
    for trial in range(10):
        pos, vel, pref_vel, radius, max_speed = _random_world(rng, A, crowded)
        collab = np.full(A, 0.5)
        ref = cpp_orca(pos, vel, pref_vel, radius, max_speed, collab,
                       dt, 1e6, A, horizon)
        ours = np.asarray(
            orca.orca_velocities(
                jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(pref_vel),
                jnp.asarray(radius), jnp.asarray(max_speed), jnp.asarray(collab),
                jnp.ones(A, bool), dt, 1e6, horizon,
            )
        )
        np.testing.assert_allclose(
            ours, ref, atol=1e-9,
            err_msg=f"A={A} crowded={crowded} trial={trial}",
        )


def test_orca_collab_coeff_zero_is_egoistic(cpp_orca):
    # coeff 0 => the agent assumes no responsibility: with a head-on
    # symmetric pair, the coeff-0 agent keeps (nearly) its preferred
    # velocity while the 0.5 agent deviates.
    pos = np.array([[-2.0, 0.0], [2.0, 0.0]])
    vel = np.array([[1.0, 0.0], [-1.0, 0.0]])
    pref_vel = vel.copy()
    radius = np.array([0.4, 0.4])
    max_speed = np.array([1.0, 1.0])
    ours_half = np.asarray(orca.orca_velocities(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(pref_vel),
        jnp.asarray(radius), jnp.asarray(max_speed), jnp.asarray([0.5, 0.5]),
        jnp.ones(2, bool), 0.2, 1e6, 5.0))
    ours_ego = np.asarray(orca.orca_velocities(
        jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(pref_vel),
        jnp.asarray(radius), jnp.asarray(max_speed), jnp.asarray([0.0, 0.5]),
        jnp.ones(2, bool), 0.2, 1e6, 5.0))
    dev_half = np.linalg.norm(ours_half[0] - pref_vel[0])
    dev_ego = np.linalg.norm(ours_ego[0] - pref_vel[0])
    assert dev_ego < dev_half
    ref = cpp_orca(pos, vel, pref_vel, radius, max_speed,
                   np.array([0.0, 0.5]), 0.2, 1e6, 2, 5.0)
    np.testing.assert_allclose(ours_ego, ref, atol=1e-9)


def test_rvo_env_rollout_matches_reference_via_shim():
    """Full-env RVO golden: the reference's OWN RVOPolicy (private-world
    mirroring, x1.05 radius, collabCoeff, pi/6 stop-and-turn —
    RVOPolicy.py:50-122) running on the C++-oracle-backed rvo2 shim
    (tests/oracle/rvo2_shim.py) vs our batched kernel.  The JAX-vs-C++
    kernel floor is 1e-9 per step; trajectories track to 1e-6 over the
    episode and every discrete latch matches exactly."""
    sc0 = presets.circle_scenario(4, radius=4.0, agent_radius=0.3)
    rng = np.random.RandomState(11)
    case = np.concatenate(
        [sc0.pos + rng.uniform(-0.3, 0.3, sc0.pos.shape), sc0.goal,
         sc0.pref_speed[:, None], sc0.radius[:, None]], -1)

    env = refsim.make_env_from_case(case, policy_name="RVO")
    ref = refsim.rollout(env, 60)

    cfg = EnvConfig(dtype="float64", done_mode="learning")
    sc = presets.from_cadrl_case(case, policy="RVO")
    state = sc.to_state(cfg)
    from gym_collision_avoidance_tpu.env.step import env_reset

    state, _ = env_reset(state, cfg)
    _, traj = runner.rollout(
        state, cfg, 60, active_policies=sc.active_policies)
    np.testing.assert_allclose(np.asarray(traj["pos"]), ref["pos"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(traj["vel"]), ref["vel"], atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(traj["is_at_goal"]), ref["is_at_goal"])
    np.testing.assert_array_equal(
        np.asarray(traj["in_collision"]), ref["in_collision"])


def test_rvo_anti_collab_env_rollout_matches_reference_via_shim():
    """End-to-end anti-collaborative RVO (RVO_COLLAB_COEFF < 0) vs the
    reference env on the rvo2 shim: the reference redraws each agent's
    noncoop-vs-adversarial flag from the GLOBAL numpy stream at window
    boundaries (RVOPolicy.py:77-90), skipping done agents; our engine
    consumes host-side draws from anti_collab_host_draws through
    params['rvo_use_noncoop'].  Same seed -> same draws -> same
    trajectories (1e-6 on the C++-vs-JAX kernel floor)."""
    from gym_collision_avoidance_tpu.env.step import env_reset, env_step
    from gym_collision_avoidance_tpu.policies import registry as policies
    from gym_collision_avoidance_tpu.policies import rvo as rvo_policy

    sc0 = presets.circle_scenario(4, radius=3.0, agent_radius=0.4)
    rng0 = np.random.RandomState(21)
    case = np.concatenate(
        [sc0.pos + rng0.uniform(-0.3, 0.3, sc0.pos.shape), sc0.goal,
         sc0.pref_speed[:, None], sc0.radius[:, None]], -1)
    steps, coeff = 40, -0.8

    refsim.import_reference()
    from gym_collision_avoidance.envs import Config as RefConfig

    orig = RefConfig.RVO_COLLAB_COEFF
    RefConfig.RVO_COLLAB_COEFF = coeff
    np.random.seed(91)
    try:
        env = refsim.make_env_from_case(case, policy_name="RVO")
        ref = refsim.rollout(env, steps)
    finally:
        RefConfig.RVO_COLLAB_COEFF = orig

    cfg = EnvConfig(dtype="float64", done_mode="learning",
                    rvo_collab_coeff=coeff)
    sc = presets.from_cadrl_case(case, policy="RVO")
    state, _ = env_reset(sc.to_state(cfg), cfg)
    host_rng = np.random.RandomState(91)
    flags = np.ones(4, bool)
    for t in range(steps):
        active = ~np.asarray(state.is_done)
        flags = rvo_policy.anti_collab_host_draws(
            flags, np.asarray(state.t), active, cfg, host_rng)
        state, _obs, _rew, _go, _info = env_step(
            state, None, cfg, {rvo_policy.NONCOOP_FLAGS_KEY: flags},
            (policies.RVO,), ("other_agents_states",), ("dist_to_goal",),
        )
        np.testing.assert_allclose(
            np.asarray(state.pos), ref["pos"][t], atol=1e-6,
            err_msg=f"t{t}")
        np.testing.assert_array_equal(
            np.asarray(state.in_collision), ref["in_collision"][t])
        np.testing.assert_array_equal(
            np.asarray(state.is_at_goal), ref["is_at_goal"][t])
    # both sides consumed the identical number of global-stream draws
    assert np.random.randint(1 << 30) == host_rng.randint(1 << 30)


def test_rvo_env_rollout_is_collision_free():
    # NOTE: a perfectly symmetric antipodal circle deadlocks under ORCA
    # (agents creep radially at ~dist/tau and never meet) — that matches
    # RVO2 semantics.  Jitter the circle so symmetry breaks and agents
    # sidestep each other.
    cfg = EnvConfig.evaluate(dtype="float64")
    sc = presets.circle_scenario(6, radius=4.0, agent_radius=0.3, policy="RVO")
    rng = np.random.RandomState(5)
    sc.pos = sc.pos + rng.uniform(-0.3, 0.3, sc.pos.shape)
    sc.heading = None
    state = sc.to_state(cfg)
    from gym_collision_avoidance_tpu.env.step import env_reset

    state, _ = env_reset(state, cfg)
    final, traj = runner.rollout(state, cfg, 600, active_policies=sc.active_policies)
    stats = runner.episode_stats(traj, cfg)
    assert not np.any(np.asarray(stats["collision"])), "RVO agents collided"
    assert bool(stats["all_at_goal"]), "RVO agents failed to reach goals"


def test_rvo_wrapper_stop_and_turn():
    # An RVO agent with its goal directly behind must stop and rotate
    # in-place at the pi/6 turn limit (RVOPolicy.py:108-111).
    import jax.numpy as jnp
    from gym_collision_avoidance_tpu.policies import rvo as rvo_policy
    from gym_collision_avoidance_tpu.core.state import init_state

    cfg = EnvConfig(dtype="float64")
    state = init_state(
        cfg,
        pos=np.array([[0.0, 0.0], [50.0, 50.0]]),
        goal=np.array([[-5.0, 0.0], [55.0, 50.0]]),
        radius=np.array([0.3, 0.3]),
        pref_speed=np.array([1.0, 1.0]),
        heading=np.array([0.0, 0.0]),
    )
    action = np.asarray(rvo_policy.rvo_kernel(state, cfg, None))
    assert action[0, 0] == 0.0
    np.testing.assert_allclose(abs(action[0, 1]), np.pi / 6, atol=1e-12)


@pytest.mark.parametrize("A", [2, 4, 10])
def test_orca_float32_matches_cpp_oracle(cpp_orca, A):
    """float32 kernel parity — the TPU serving dtype.  The f64-only suite
    once missed an f32-breaking bug (guard constants like 1e-300
    underflow to 0 in f32, turning the degenerate self row into NaN in
    the gather-free formulation); this pins the f32 path at f32-level
    tolerance and asserts NaN-freedom."""
    rng = np.random.RandomState(29 + A)
    for trial in range(6):
        pos = rng.uniform(-4, 4, (A, 2))
        vel = rng.uniform(-1, 1, (A, 2))
        pref = rng.uniform(-1, 1, (A, 2))
        radius = rng.uniform(0.2, 0.5, A)
        ms = np.ones(A)
        collab = np.full(A, 0.5)
        ref = cpp_orca(pos, vel, pref, radius, ms, collab, 0.2, 1e6, A, 5.0)
        ours = np.asarray(orca.orca_velocities(
            jnp.asarray(pos, jnp.float32), jnp.asarray(vel, jnp.float32),
            jnp.asarray(pref, jnp.float32), jnp.asarray(radius, jnp.float32),
            jnp.asarray(ms, jnp.float32), jnp.asarray(collab, jnp.float32),
            jnp.ones(A, bool), 0.2, 1e6, 5.0,
        ))
        assert np.isfinite(ours).all(), f"NaN/inf at A={A} trial={trial}"
        np.testing.assert_allclose(ours, ref, atol=2e-3,
                                   err_msg=f"A={A} trial={trial}")
