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
