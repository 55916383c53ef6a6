"""PPO trainer tests: GAE correctness, learning progress, and
data-parallel (shard_map) equivalence with the single-device run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _numpy_gae(rews, vals, dones, last_val, gamma, lam):
    T, E = rews.shape
    adv = np.zeros((T, E), np.float64)
    gae = np.zeros(E, np.float64)
    next_val = last_val.astype(np.float64)
    for t in range(T - 1, -1, -1):
        nonterm = 1.0 - dones[t]
        delta = rews[t] + gamma * next_val * nonterm - vals[t]
        gae = delta + gamma * lam * nonterm * gae
        adv[t] = gae
        next_val = vals[t]
    return adv


def test_gae_matches_numpy_reference():
    from gym_collision_avoidance_tpu.train import compute_gae

    rng = np.random.RandomState(0)
    T, E = 17, 5
    rews = rng.randn(T, E).astype(np.float32)
    vals = rng.randn(T, E).astype(np.float32)
    dones = (rng.rand(T, E) < 0.2).astype(np.float32)
    last = rng.randn(E).astype(np.float32)
    adv, target = compute_gae(
        jnp.asarray(rews), jnp.asarray(vals), jnp.asarray(dones),
        jnp.asarray(last), 0.99, 0.95,
    )
    ref = _numpy_gae(rews, vals, dones, last, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(adv), ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(target), ref + vals, rtol=1e-5, atol=1e-5
    )


def test_ppo_single_agent_learns():
    """Goal-reaching with dense shaping: per-episode return must climb."""
    from gym_collision_avoidance_tpu.train import PPOConfig, make_ppo

    ppo = PPOConfig(num_envs=128, horizon=32, num_agents=1, epochs=4,
                    num_minibatches=4, lr=1e-3, seed=0)
    train_step, init_fn, _ = make_ppo(ppo)
    rng = jax.random.PRNGKey(0)
    carry = list(init_fn(rng))
    ts = jax.jit(train_step)
    rets = []
    for _ in range(20):
        rng, k = jax.random.split(rng)
        *carry, m = ts(*carry, k)
        rets.append(float(m["mean_return_per_episode"]))
    rets = np.asarray(rets)
    assert np.isfinite(rets).all()
    # measured: -0.2 -> +0.85 in 20 iters; require a robust margin
    assert rets[-5:].mean() > rets[:5].mean() + 0.3, rets


def test_ppo_two_agent_traffic_runs():
    from gym_collision_avoidance_tpu.train import PPOConfig, make_ppo

    ppo = PPOConfig(num_envs=16, horizon=8, num_agents=3, epochs=2,
                    num_minibatches=2, seed=1)
    train_step, init_fn, _ = make_ppo(ppo)
    rng = jax.random.PRNGKey(1)
    carry = list(init_fn(rng))
    ts = jax.jit(train_step)
    for _ in range(2):
        rng, k = jax.random.split(rng)
        *carry, m = ts(*carry, k)
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(carry[0]))
    assert np.isfinite(float(m["loss"]))


def test_ppo_ga3c_arch_learns():
    """PPO over the reference's own GA3C-CADRL architecture (LSTM net,
    11 discrete actions via the LearningPolicyGA3C table) must learn
    goal-reaching from scratch on-device."""
    from gym_collision_avoidance_tpu.train import PPOConfig, make_ppo

    ppo = PPOConfig(num_envs=128, horizon=32, num_agents=1, epochs=4,
                    num_minibatches=4, lr=1e-3, policy_arch="ga3c", seed=0)
    train_step, init_fn, obs_dim = make_ppo(ppo)
    assert obs_dim == 5 + 7 * 3  # policy-obs layout, K=3 default
    rng = jax.random.PRNGKey(0)
    carry = list(init_fn(rng))
    ts = jax.jit(train_step)
    rets = []
    for _ in range(15):
        rng, k = jax.random.split(rng)
        *carry, m = ts(*carry, k)
        rets.append(float(m["mean_return_per_episode"]))
    rets = np.asarray(rets)
    assert np.isfinite(rets).all()
    # measured: +0.03 (first5) -> +0.89 (last5 of 25); 15 iters with margin
    assert rets[-5:].mean() > rets[:5].mean() + 0.25, rets


def test_ppo_self_play_learns():
    """Parameter-shared self-play (all 4 agents train the shared GA3C
    net): collision-heavy random play must improve measurably."""
    from gym_collision_avoidance_tpu.train import PPOConfig, make_ppo

    ppo = PPOConfig(num_envs=64, horizon=32, num_agents=4, epochs=3,
                    num_minibatches=4, policy_arch="ga3c", self_play=True,
                    lr=1e-3, seed=0)
    train_step, init_fn, _ = make_ppo(ppo)
    rng = jax.random.PRNGKey(0)
    carry = list(init_fn(rng))
    ts = jax.jit(train_step)
    rets = []
    for _ in range(18):
        rng, k = jax.random.split(rng)
        *carry, m = ts(*carry, k)
        rets.append(float(m["mean_return_per_episode"]))
    rets = np.asarray(rets)
    assert np.isfinite(rets).all()
    # measured: -0.58 (first5) -> -0.11 (last5 of 30); require margin at 18
    assert rets[-5:].mean() > rets[:5].mean() + 0.15, rets


def test_trained_ga3c_params_deploy_in_frozen_policy_path(tmp_path):
    """A PPO-trained GA3C net must slot straight into the frozen-policy
    evaluation path: same param pytree contract as the converted
    checkpoints (models.ga3c_cadrl.load_params)."""
    import jax.numpy as jnp

    from gym_collision_avoidance_tpu import EnvConfig
    from gym_collision_avoidance_tpu.env.batch import batched_env_step
    from gym_collision_avoidance_tpu.env.step import env_reset
    from gym_collision_avoidance_tpu.models import ga3c_cadrl
    from gym_collision_avoidance_tpu.scenarios import presets
    from gym_collision_avoidance_tpu.train import PPOConfig, make_ppo

    ppo = PPOConfig(num_envs=32, horizon=16, num_agents=4, epochs=2,
                    num_minibatches=2, policy_arch="ga3c", self_play=True,
                    seed=2)
    train_step, init_fn, _ = make_ppo(ppo)
    rng = jax.random.PRNGKey(2)
    carry = list(init_fn(rng))
    ts = jax.jit(train_step)
    for _ in range(2):
        rng, k = jax.random.split(rng)
        *carry, _m = ts(*carry, k)

    # export exactly like scripts/train_ppo.py --export-params
    path = str(tmp_path / "trained_ga3c.npz")
    np.savez(path, **{k: np.asarray(v) for k, v in carry[0].items()})
    params = {"ga3c_cadrl": ga3c_cadrl.load_params(path)}

    # drive the trained net through the internal GA3C policy id
    cfg = EnvConfig(dtype="float32")
    sc = presets.circle_scenario(4, radius=3.0, agent_radius=0.5,
                                 policy="GA3C_CADRL")
    state = sc.to_state(cfg)
    state, obs = env_reset(state, cfg)
    states = jax.tree.map(lambda x: jnp.broadcast_to(x, (8,) + x.shape), state)
    for _ in range(5):
        states, _o, rew, _go, _i = batched_env_step(
            states, None, cfg, params, sc.active_policies,
            ("other_agents_states",), ("dist_to_goal",),
        )
    assert np.isfinite(np.asarray(states.pos)).all()
    # the net must actually drive motion (not frozen at spawn)
    assert float(jnp.max(jnp.abs(states.pos - state.pos[None]))) > 1e-3

    # ... and register as a NAMED policy usable by the evaluation harness
    from gym_collision_avoidance_tpu.harness import experiments
    from gym_collision_avoidance_tpu.harness import registry as hreg

    hreg.register_trained_policy("ppo-selfplay-test", path)
    try:
        res = experiments.run_full_test_suite(
            policies_to_test=("ppo-selfplay-test",),
            num_agents_to_test=(2,), num_test_cases=4,
        )
        df = res[(2, "ppo-selfplay-test")]
        assert len(df) == 4
        assert np.isfinite(np.stack(df["total_reward"].to_list())).all()
    finally:
        hreg.POLICY_SPECS.pop("ppo-selfplay-test", None)


def test_shipped_ppo_selfplay_checkpoint_aces_2agent_cases():
    """The shipped on-device-trained checkpoint (RESULTS.md run C: 100%
    success on the full 2-agent suite) must reproduce on a subset."""
    from gym_collision_avoidance_tpu.harness import experiments

    res = experiments.run_full_test_suite(
        policies_to_test=("PPO-selfplay-2agent",),
        num_agents_to_test=(2,), num_test_cases=25,
    )
    df = res[(2, "PPO-selfplay-2agent")]
    assert len(df) == 25
    success = np.array([bool(np.all(a)) for a in df["all_at_goal"]])
    collision = np.array([bool(np.any(c)) for c in df["collision"]])
    assert success.all(), success
    assert not collision.any(), collision


def test_shipped_curriculum_checkpoint_beats_rvo_tier_at_4_agents():
    """The shipped curriculum net (RESULTS.md run F: 95.8% at 4 agents)
    must stay way above chance on a 4-agent suite subset."""
    from gym_collision_avoidance_tpu.harness import experiments

    res = experiments.run_full_test_suite(
        policies_to_test=("PPO-selfplay-4agent",),
        num_agents_to_test=(4,), num_test_cases=50,
    )
    df = res[(4, "PPO-selfplay-4agent")]
    success = np.array([bool(np.all(a)) for a in df["all_at_goal"]])
    # full-suite rate is 95.8%; allow sampling margin on 50 cases
    assert success.mean() >= 0.85, success.mean()


def test_shipped_final_curriculum_checkpoint_high_density():
    """The flagship curriculum net (RESULTS.md run H: 95.8% at 10
    agents) must reproduce its high-density quality on a suite subset."""
    from gym_collision_avoidance_tpu.harness import experiments

    res = experiments.run_full_test_suite(
        policies_to_test=("PPO-selfplay-10agent",),
        num_agents_to_test=(10,), num_test_cases=50,
    )
    df = res[(10, "PPO-selfplay-10agent")]
    success = np.array([bool(np.all(a)) for a in df["all_at_goal"]])
    # full-suite rate is 95.8%; allow sampling margin on 50 cases
    assert success.mean() >= 0.86, success.mean()


def test_ppo_checkpoint_resume_is_bitwise(tmp_path):
    """Saving the training carry and resuming must continue the run
    bitwise (same rng stream -> identical params and env states)."""
    from gym_collision_avoidance_tpu.train import PPOConfig, make_ppo
    from gym_collision_avoidance_tpu.utils import checkpoint as ckpt

    ppo = PPOConfig(num_envs=16, horizon=8, num_agents=2, epochs=2,
                    num_minibatches=2, seed=5)
    train_step, init_fn, _ = make_ppo(ppo)
    ts = jax.jit(train_step)

    def advance(carry, rng, n):
        for _ in range(n):
            rng, k = jax.random.split(rng)
            *carry, _m = ts(*carry, k)
        return tuple(carry), rng

    carry, rng0 = tuple(init_fn(jax.random.PRNGKey(5))), jax.random.PRNGKey(9)
    carry2, rng2 = advance(carry, rng0, 2)
    path = str(tmp_path / "ppo_carry.npz")
    ckpt.save_state(path, carry2)
    straight, _ = advance(carry2, rng2, 2)
    resumed, _ = advance(ckpt.load_state(path, carry2), rng2, 2)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        straight, resumed,
    )


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_ppo_shard_map_matches_single_device():
    """DP-PPO over 4 shards must reproduce the unsharded update: same
    rollout (per-env-id keyed noise), pmean-ed advantage stats and grads.
    Restricted to 1 epoch x 1 minibatch so the minibatch composition is
    the full batch in both runs (multi-minibatch shuffles differ by
    construction)."""
    from jax.sharding import Mesh

    from gym_collision_avoidance_tpu.train import (
        PPOConfig, make_ppo, make_sharded_ppo,
    )

    D, E_local, T = 4, 8, 6
    E = D * E_local
    common = dict(horizon=T, num_agents=2, epochs=1, num_minibatches=1,
                  lr=1e-3, seed=3)

    # single-device reference
    ppo1 = PPOConfig(num_envs=E, **common)
    ts1, init1, _ = make_ppo(ppo1)
    rng = jax.random.PRNGKey(42)
    carry1 = init1(jax.random.PRNGKey(3))
    out1 = jax.jit(ts1)(*carry1, rng)

    # sharded run from the SAME initial carry, env axis split over 4
    mesh = Mesh(np.array(jax.devices()[:D]), ("env",))
    stepD, _initD, _ = make_sharded_ppo(ppo1, mesh)
    outD = stepD(*carry1, rng)

    # params after the update agree (float-assoc tolerance only)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        ),
        out1[0], outD[0],
    )
    # the carried env states agree exactly (same per-env trajectories)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6
        ),
        out1[2], outD[2],
    )
    np.testing.assert_array_equal(np.asarray(out1[3]), np.asarray(outD[3]))


def test_ppo_drl_long_arch_learns():
    """PPO over the DRL-Long laserscan CNN (the policy the reference
    ships BROKEN — empty submodule, no checkpoint) must learn from
    scratch, observing the world only through the 3-deep scan stack +
    polar goal.  2 agents so the scans are non-blank (the conv pathway
    sees the other agent's disc); learning is slower than the MLP — the
    goal signal is 2 of fc2's 260 inputs — so the margin is modest over
    30 iters (measured: -0.415 -> -0.258)."""
    from gym_collision_avoidance_tpu import EnvConfig
    from gym_collision_avoidance_tpu.train import PPOConfig, make_ppo

    cfg = EnvConfig(dtype="float32", done_mode="learning",
                    reward_time_step=-0.01, laserscan_length=128,
                    use_static_map=True)
    ppo = PPOConfig(num_envs=64, horizon=32, num_agents=2, epochs=4,
                    num_minibatches=4, lr=1e-3, policy_arch="drl_long",
                    seed=0)
    train_step, init_fn, obs_dim = make_ppo(ppo, cfg=cfg)
    assert obs_dim == 4 + 3 * 128  # [d_goal, heading, pref, r] + scans
    rng = jax.random.PRNGKey(0)
    carry = list(init_fn(rng))
    ts = jax.jit(train_step)
    rets = []
    for _ in range(30):
        rng, k = jax.random.split(rng)
        *carry, m = ts(*carry, k)
        rets.append(float(m["mean_return_per_episode"]))
    rets = np.asarray(rets)
    assert np.isfinite(rets).all()
    assert rets[-5:].mean() > rets[:5].mean() + 0.08, rets


def test_ppo_drl_long_sharded_matches_single_device():
    """The drl_long (laserscan CNN) training step under shard_map on the
    8-virtual-device mesh must match the single-device update — the scan
    sensing + conv net path through the sharded rollout, same contract
    the ga3c arch has."""
    from jax.sharding import Mesh

    from gym_collision_avoidance_tpu import EnvConfig
    from gym_collision_avoidance_tpu.train import (
        PPOConfig, make_ppo, make_sharded_ppo,
    )

    cfg = EnvConfig(dtype="float32", done_mode="learning",
                    reward_time_step=-0.01, laserscan_length=128,
                    use_static_map=True)
    ppo = PPOConfig(num_envs=16, horizon=8, num_agents=2, epochs=1,
                    num_minibatches=1, policy_arch="drl_long", seed=3)
    tstep, init_fn, _ = make_ppo(ppo, cfg=cfg)
    mesh = Mesh(np.array(jax.devices()[:8]), ("env",))
    sstep, sinit, _ = make_sharded_ppo(ppo, mesh, cfg=cfg)

    rng = jax.random.PRNGKey(3)
    carry0 = init_fn(rng)
    out_single = jax.jit(tstep)(*carry0, jax.random.PRNGKey(4))
    out_sharded = sstep(*sinit(rng), jax.random.PRNGKey(4))

    # params after one update: identical math modulo pmean summation
    # order on the gradients — tight tolerance, not bitwise.  Exception:
    # a near-zero gradient (log_std on the first update) makes adam's
    # first step +-lr with the SIGN set by float summation order, so
    # those elements can differ by up to 2*lr=6e-4 legitimately.
    for (ka, a), (_, b) in zip(
        sorted(out_single[0].items()), sorted(out_sharded[0].items())
    ):
        tol = dict(atol=7e-4) if ka == "log_std" else dict(rtol=2e-4,
                                                           atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), err_msg=ka, **tol
        )
