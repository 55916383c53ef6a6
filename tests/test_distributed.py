"""Multi-host distributed layer: single-process parity + a real
2-process ``jax.distributed`` launch (the CI-able multi-host test).

Replaces the reference's serial DummyVecEnv surface (envs/vec_env.py:6-191)
with the pod-style runtime in parallel/distributed.py.
"""

import json
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.env.step import env_reset
from gym_collision_avoidance_tpu.parallel import distributed as dist
from gym_collision_avoidance_tpu.parallel import mesh as pmesh
from gym_collision_avoidance_tpu.scenarios import presets

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _batch(cfg, E, A=4, radius=3.0, agent_radius=0.5):
    sc = presets.circle_scenario(A, radius=radius, agent_radius=agent_radius)
    base, _ = env_reset(sc.to_state(cfg), cfg)
    states = jax.tree.map(lambda x: jnp.broadcast_to(x, (E,) + x.shape), base)
    return states, base, sc


def test_init_distributed_noop_without_coordinator():
    assert dist.init_distributed() is False


def test_distributed_rollout_matches_unsharded_states():
    cfg = EnvConfig.evaluate(dtype="float32")
    states, base, sc = _batch(cfg, 16)
    mesh = dist.global_mesh()
    assert mesh.devices.size == 8

    run = dist.make_distributed_rollout(
        cfg, 24, mesh, active_policies=sc.active_policies
    )
    gstates = dist.host_local_batch(lambda i: base, 16, mesh)
    final_d, metrics = run(gstates)

    # plain (unsharded) batched rollout of the same 16 envs
    run_plain = pmesh.make_batched_rollout(cfg, 24, active_policies=sc.active_policies)
    final_p, _ = run_plain(states)

    np.testing.assert_allclose(
        np.asarray(final_d.pos), np.asarray(final_p.pos), rtol=0, atol=0
    )
    # metrics are per-step scalars, replicated across devices
    assert np.asarray(metrics["mean_reward"]).shape == (24,)
    # the circle-with-collisions scenario must produce reward signal
    assert np.any(np.asarray(metrics["mean_reward"]) != 0.0)
    assert np.asarray(metrics["done_count"])[-1] > 0


def test_host_local_batch_slices():
    mesh = dist.global_mesh()
    start, count = dist.process_env_slice(32, mesh)
    # single process owns the whole mesh
    assert (start, count) == (0, 32)
    with pytest.raises(ValueError):
        dist.process_env_slice(13, mesh)


def test_two_process_jax_distributed_launch():
    """Spawn 2 real processes that join one jax.distributed runtime over a
    localhost coordinator (2 x 4 virtual CPU devices -> 8-device global
    mesh) and run the shard_map rollout; validate the reduced-metric
    checksum against an in-process run of the identical program."""
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "launch_multihost.py"),
            "--spawn", "2", "--devices-per-host", "4",
            "--num-envs", "32", "--steps", "48", "--port", "7741",
        ],
        capture_output=True, text=True, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    result = json.loads(line)
    assert result["num_processes"] == 2
    assert result["global_devices"] == 8

    # same program in-process (8 local devices, same global batch)
    cfg = EnvConfig.evaluate(dtype="float32")
    sc = presets.circle_scenario(4, radius=4.0, agent_radius=0.4)
    base, _ = env_reset(sc.to_state(cfg), cfg)
    mesh = dist.global_mesh()
    states = dist.host_local_batch(lambda i: base, 32, mesh)
    run = dist.make_distributed_rollout(cfg, 48, mesh, active_policies=sc.active_policies)
    _, metrics = run(states)
    expected = float(np.asarray(metrics["mean_reward"]).sum())
    assert result["metrics_checksum"] == pytest.approx(expected, abs=1e-6)
