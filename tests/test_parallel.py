"""Multi-device sharding of the env batch (8 virtual CPU devices)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.env.step import env_reset
from gym_collision_avoidance_tpu.parallel import mesh as pmesh
from gym_collision_avoidance_tpu.scenarios import presets


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    return pmesh.make_mesh(8)


def _batch(cfg, E, A=4):
    sc = presets.circle_scenario(A, radius=3.0, agent_radius=0.4)
    state = sc.to_state(cfg)
    state, _ = env_reset(state, cfg)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (E,) + x.shape), state), sc


def test_sharded_batch_step_matches_unsharded(mesh8):
    cfg = EnvConfig.evaluate(dtype="float32")
    states, sc = _batch(cfg, 16)
    step = pmesh.make_batched_step(cfg, sc.active_policies, donate=False)

    out_plain = step(states)
    states_sharded = pmesh.shard_env_batch(states, mesh8)
    out_sharded = step(states_sharded)

    np.testing.assert_array_equal(
        np.asarray(out_plain[0].pos), np.asarray(out_sharded[0].pos)
    )
    # the sharded output keeps the env axis distributed
    shard_devs = {d for d in out_sharded[0].pos.sharding.device_set}
    assert len(shard_devs) == 8


def test_sharded_rollout_with_metric_reduction(mesh8):
    cfg = EnvConfig.evaluate(dtype="float32")
    states, sc = _batch(cfg, 32)
    run = pmesh.make_batched_rollout(
        cfg, 16, active_policies=sc.active_policies, mesh=mesh8
    )
    states = pmesh.shard_env_batch(states, mesh8)
    final, metrics = run(states)
    # reduced metrics are scalars per step (cross-device reduction happened)
    assert metrics["mean_reward"].shape == (16,)
    assert np.isfinite(np.asarray(metrics["mean_reward"])).all()
    assert np.asarray(metrics["done_frac"])[-1] >= 0.0


def test_graft_dryrun_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.dryrun_multichip(8)


def test_sharded_autoreset_server_matches_unsharded(mesh8):
    """THE serving workload on the mesh (SURVEY §2.3 obligation 2): the
    in-graph autoreset loop behind the bench headline, sharded P("env")
    across 8 devices — episode counters and full state pytree must be
    BIT-IDENTICAL to the single-device server after several dispatches
    (per-env physics is device-placement-invariant; only the scalar
    metric reductions cross devices)."""
    from gym_collision_avoidance_tpu.harness.serving import AutoresetServer
    from gym_collision_avoidance_tpu.scenarios import random_cases

    cfg = EnvConfig(dtype="float32", done_mode="evaluate")
    pool = random_cases.scenario_pool(8, 4, seed=0, side_length=4.0)
    policy_id = np.full(4, 1, np.int32)  # NONCOOP

    def build(mesh):
        return AutoresetServer(
            cfg, pool, policy_id, num_envs=16, steps_per_dispatch=32,
            mesh=mesh,
        )

    plain, sharded = build(None), build(mesh8)
    for _ in range(3):
        out_p = plain.dispatch()
        out_s = sharded.dispatch()
    # the scalar METRIC reductions are the one place sharding changes
    # the float summation order (per-shard partial sums + cross-device
    # reduce) — ulp-level difference expected, physics unaffected
    np.testing.assert_allclose(
        np.asarray(out_p["obs_checksum"]), np.asarray(out_s["obs_checksum"]),
        rtol=1e-6,
    )
    assert plain.episodes_completed() == sharded.episodes_completed()
    assert plain.episodes_completed() > 0  # episodes actually cycled
    for a, b in zip(
        jax.tree.leaves(plain.states()), jax.tree.leaves(sharded.states())
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the sharded carry really is distributed over all 8 devices
    assert len(sharded.states().pos.sharding.device_set) == 8


def test_sharded_nn_policy_step_matches_unsharded(mesh8):
    """The production pod-serving shape: env axis sharded over the mesh,
    GA3C params replicated — outputs bit-identical to the unsharded
    program (SURVEY §2.3 obligation 1 with a real NN policy in the
    loop, not just the scripted ones)."""
    from gym_collision_avoidance_tpu.models import ga3c_cadrl

    cfg = EnvConfig.evaluate(
        dtype="float32", max_num_other_agents_observed=19,
        agent_sorting_method="closest_last",
    )
    sc = presets.circle_scenario(
        4, radius=3.0, agent_radius=0.4, policy="GA3C_CADRL"
    )
    state = sc.to_state(cfg)
    state, _ = env_reset(state, cfg)
    states = jax.tree.map(lambda x: jnp.broadcast_to(x, (16,) + x.shape), state)
    params = {"ga3c_cadrl": ga3c_cadrl.load_params()}
    step = pmesh.make_batched_step(cfg, sc.active_policies, donate=False)

    out_plain = step(states, params)
    out_sharded = step(pmesh.shard_env_batch(states, mesh8), params)

    np.testing.assert_array_equal(
        np.asarray(out_plain[0].pos), np.asarray(out_sharded[0].pos)
    )
    np.testing.assert_array_equal(
        np.asarray(out_plain[2]), np.asarray(out_sharded[2])  # rewards
    )
    assert len(out_sharded[0].pos.sharding.device_set) == 8
