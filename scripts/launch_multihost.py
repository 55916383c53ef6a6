"""Multi-host launcher for the distributed env batch.

One process per host, pod-style.  Replaces the reference's serial
``DummyVecEnv`` loop (envs/vec_env.py:6-191) with a
``jax.distributed`` runtime + global ``("env",)`` mesh
(see gym_collision_avoidance_tpu/parallel/distributed.py).

Real fleet (one line per host)::

    python scripts/launch_multihost.py --coordinator host0:7733 \
        --num-processes 4 --process-id $I --num-envs 4096 --steps 256

Local demonstration / CI (spawns N CPU processes that do the full
coordinator handshake, each with --devices-per-host virtual devices)::

    python scripts/launch_multihost.py --spawn 2 --devices-per-host 4 \
        --num-envs 64 --steps 32

Process 0 prints one JSON line with aggregate throughput and the
per-step reduced metrics checksum (identical on every host by
construction — the shard_map pmean/psum collectives).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--coordinator", default=None, help="host:port of process 0")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--devices-per-host", type=int, default=None,
                   help="virtual CPU devices per process (CPU demo mode)")
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--num-agents", type=int, default=4)
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--spawn", type=int, default=None,
                   help="spawn N local worker processes (demo/CI mode)")
    p.add_argument("--port", type=int, default=7733)
    p.add_argument("--reps", type=int, default=1,
                   help="timed repetitions after warmup; reports the "
                        "median (steady-state benchmark mode)")
    return p.parse_args(argv)


def spawn_local(args) -> int:
    """Parent mode: launch N copies of this script as coordinator-connected
    worker processes on localhost."""
    procs = []
    for i in range(args.spawn):
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--coordinator", f"localhost:{args.port}",
            "--num-processes", str(args.spawn),
            "--process-id", str(i),
            "--num-envs", str(args.num_envs),
            "--num-agents", str(args.num_agents),
            "--steps", str(args.steps),
            "--reps", str(args.reps),
            "--port", str(args.port),
        ]
        if args.devices_per_host:
            cmd += ["--devices-per-host", str(args.devices_per_host)]
        procs.append(subprocess.Popen(cmd))
    rc = 0
    for p in procs:
        rc |= p.wait()
    return rc


def run_worker(args) -> None:
    # children are launched as `python scripts/launch_multihost.py`, which
    # puts scripts/ (not the repo root) on sys.path
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    if args.devices_per_host:
        # must be set before jax import; JAX_PLATFORMS via config below.
        # Strip any inherited device-count flag (e.g. from the test
        # harness) — with duplicates the first occurrence wins.
        flags = [
            f for f in os.environ.get("XLA_FLAGS", "").split()
            if not f.startswith("--xla_force_host_platform_device_count")
        ]
        flags.append(
            f"--xla_force_host_platform_device_count={args.devices_per_host}"
        )
        os.environ["XLA_FLAGS"] = " ".join(flags)
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import numpy as np
    from gym_collision_avoidance_tpu import EnvConfig
    from gym_collision_avoidance_tpu.env.step import env_reset
    from gym_collision_avoidance_tpu.parallel import distributed as dist
    from gym_collision_avoidance_tpu.scenarios import presets

    dist.init_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    mesh = dist.global_mesh()

    cfg = EnvConfig.evaluate(dtype="float32")
    sc = presets.circle_scenario(args.num_agents, radius=4.0, agent_radius=0.4)
    base, _ = env_reset(sc.to_state(cfg), cfg)
    states = dist.host_local_batch(lambda i: base, args.num_envs, mesh)

    run = dist.make_distributed_rollout(
        cfg, args.steps, mesh, active_policies=sc.active_policies
    )
    # compile + warm once, then measure --reps timed repetitions
    final, metrics = run(states)
    jax.block_until_ready(metrics)
    elapsed = []
    for _ in range(max(args.reps, 1)):
        states2 = dist.host_local_batch(lambda i: base, args.num_envs, mesh)
        jax.block_until_ready(states2)
        t0 = time.perf_counter()
        final, metrics = run(states2)
        jax.block_until_ready(metrics)
        elapsed.append(time.perf_counter() - t0)

    env_steps = args.num_envs * args.num_agents * args.steps
    checksum = float(np.asarray(metrics["mean_reward"]).sum())
    rates = sorted(env_steps / e for e in elapsed)
    if jax.process_index() == 0:
        print(json.dumps({
            "num_processes": jax.process_count(),
            "global_devices": len(jax.devices()),
            "num_envs": args.num_envs,
            "steps": args.steps,
            "agent_steps_per_s": rates[len(rates) // 2],
            "spread_min": rates[0],
            "spread_max": rates[-1],
            "metrics_checksum": checksum,
        }))


def main(argv=None):
    args = parse_args(argv)
    if args.spawn:
        raise SystemExit(spawn_local(args))
    run_worker(args)


if __name__ == "__main__":
    main()
