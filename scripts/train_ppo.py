"""Train a LearningPolicy agent with on-device PPO.

The TPU-native trainer for the workflow the reference serves externally
(gym loop + LearningPolicy, envs/collision_avoidance_env.py:208-218):
rollout (in-graph autoreset), GAE, and every optimizer epoch run inside
ONE jitted function per iteration.  With --devices > 1 the env axis is
sharded over a device mesh via shard_map (gradients pmean-ed per
minibatch, replicas bit-identical).

Usage:
  python scripts/train_ppo.py [--iters 50] [--envs 1024] [--horizon 64]
                              [--agents 2] [--traffic noncoop|rvo]
                              [--devices N] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--envs", type=int, default=1024)
    ap.add_argument("--horizon", type=int, default=64)
    ap.add_argument("--agents", type=int, default=2)
    ap.add_argument("--traffic", default="noncoop", choices=["noncoop", "rvo"])
    ap.add_argument("--arch", default="mlp",
                    choices=["mlp", "ga3c", "drl_long"],
                    help="mlp: Gaussian MLP on the [0,1]^2 action box; "
                         "ga3c: the reference's GA3C-CADRL LSTM net with "
                         "its 11 discrete actions, trained from scratch; "
                         "drl_long: the DRL-Long laserscan CNN (broken/"
                         "checkpointless in the reference) trained from "
                         "scratch on the 3-deep scan stack")
    ap.add_argument("--self-play", action="store_true",
                    help="every agent runs (and trains) the shared net — "
                         "the parameter-shared self-play regime of the "
                         "GA3C-CADRL papers; --traffic is then unused")
    ap.add_argument("--devices", type=int, default=1,
                    help="shard the env axis over this many devices")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0,
                    help="training RNG seed (init + rollout streams; the "
                         "scenario pool keeps its own fixed seed so "
                         "replicates train on the identical task "
                         "distribution)")
    ap.add_argument("--entropy", type=float, default=None,
                    help="entropy bonus coefficient (default: the "
                         "PPOConfig default 1e-3; use 0 for --arch "
                         "drl_long — with that trunk's weak early mean "
                         "gradient the bonus drives log_std up at the "
                         "full adam rate and the policy drowns in its "
                         "own exploration noise, round-5 diagnosis)")
    ap.add_argument("--shaping", type=float, default=0.3,
                    help="training-side progress-shaping coefficient; "
                         "high values out-reward the env's -0.25 collision "
                         "penalty and teach reckless goal-rushing at "
                         "density (measured in RESULTS.md) — lower it "
                         "when collision rate matters")
    ap.add_argument("--pool-cases", type=int, default=256,
                    help="scenario pool size for in-graph autoreset")
    ap.add_argument("--agents-mix", default=None, metavar="N,N,...",
                    help="comma-separated agent counts for a mixed-density "
                         "pool (e.g. '3,4,10'): cases cycle through the "
                         "counts, padded to the max with inert invalid "
                         "agents; overrides --agents (set to the max)")
    ap.add_argument("--pool-side", type=float, default=4.0,
                    help="scenario side length (4.0 matches the frozen "
                         "500-case evaluation suites' distribution)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--save", default=None, metavar="PATH",
                    help="save the full training carry here at the end "
                         "(and every 20 iterations)")
    ap.add_argument("--resume", default=None, metavar="PATH",
                    help="resume from a carry saved by --save (bitwise "
                         "continuation of the interrupted run)")
    ap.add_argument("--init-params", default=None, metavar="PATH",
                    help="(--arch ga3c/drl_long) warm-start the net from an .npz "
                         "exported by --export-params — the curriculum "
                         "mechanism: a fresh optimizer + fresh envs (any "
                         "agent count) around a previously trained net")
    ap.add_argument("--export-params", default=None, metavar="PATH",
                    help="(--arch ga3c) write the trained net as an .npz "
                         "checkpoint loadable by models.ga3c_cadrl."
                         "load_params — i.e. usable anywhere the frozen "
                         "GA3C-CADRL checkpoints are (policy zoo, "
                         "harness campaigns, serving benches)")
    args = ap.parse_args()

    import jax

    from gym_collision_avoidance_tpu.utils.jaxcache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from gym_collision_avoidance_tpu.policies import registry as P
    from gym_collision_avoidance_tpu.train import PPOConfig, make_ppo

    traffic = {"noncoop": P.NONCOOP, "rvo": P.RVO}[args.traffic]
    D = args.devices
    assert args.envs % max(D, 1) == 0

    from gym_collision_avoidance_tpu.scenarios import random_cases

    if args.agents_mix:
        counts = [int(a) for a in args.agents_mix.split(",")]
        args.agents = max(counts)
        pool = random_cases.scenario_pool_mixed(
            args.pool_cases, counts, seed=0, side_length=args.pool_side
        )
    else:
        pool = random_cases.scenario_pool(
            args.pool_cases, args.agents, seed=0, side_length=args.pool_side
        )

    ppo = PPOConfig(
        num_envs=args.envs, horizon=args.horizon,
        num_agents=args.agents, lr=args.lr, traffic_policy=traffic,
        policy_arch=args.arch, self_play=args.self_play,
        shaping_coef=args.shaping, seed=args.seed,
        **({} if args.entropy is None else {"entropy_coef": args.entropy}),
    )

    if D > 1:
        from jax.sharding import Mesh

        from gym_collision_avoidance_tpu.train import make_sharded_ppo

        if len(jax.devices()) < D:
            sys.exit(
                f"--devices {D} but only {len(jax.devices())} JAX devices "
                "visible (for a CPU dry run: "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={D})"
            )
        mesh = Mesh(np.array(jax.devices()[:D]), ("env",))
        step, init_fn, obs_dim = make_sharded_ppo(ppo, mesh, pool=pool)
        carry = init_fn(jax.random.PRNGKey(ppo.seed))
    else:
        train_step, init_fn, obs_dim = make_ppo(ppo, pool=pool)
        step = jax.jit(train_step)
        carry = init_fn(jax.random.PRNGKey(ppo.seed))

    print(f"obs_dim={obs_dim} envs={args.envs} horizon={args.horizon} "
          f"agents={args.agents} traffic={args.traffic} devices={D}")

    from gym_collision_avoidance_tpu.utils import checkpoint as ckpt

    if args.resume:
        carry = ckpt.load_state(args.resume, tuple(carry))
        print(f"resumed from {args.resume}")
    elif args.init_params:
        if args.arch not in ("ga3c", "drl_long"):
            sys.exit("--init-params requires --arch ga3c or drl_long")
        import jax.numpy as jnp

        with np.load(args.init_params) as z:
            params = {k: jnp.asarray(z[k]) for k in z.files}
        assert set(params) == set(carry[0]), "checkpoint/net key mismatch"
        # Swap the net only.  carry[1] (fresh tx.init state: zero Adam
        # moments, step 0) is shape-keyed, not value-keyed, so it is
        # already the correct fresh optimizer state for the warm-started
        # params — the curriculum recipe: previous-stage Adam moments
        # carry no useful signal into the new scenario distribution.
        carry = (params,) + tuple(carry[1:])
        print(f"warm-started params from {args.init_params}")

    rng = jax.random.PRNGKey(ppo.seed + 7)
    carry = list(carry)
    t0 = time.time()
    steps_done = 0
    for i in range(args.iters):
        rng, k = jax.random.split(rng)
        *carry, m = step(*carry, k)
        steps_done += args.envs * args.horizon
        if args.save and i and i % 20 == 0:
            ckpt.save_state(args.save, tuple(carry))
        if i % max(1, args.iters // 20) == 0 or i == args.iters - 1:
            dt = time.time() - t0
            print(
                f"iter {i:4d}  return/ep {float(m['mean_return_per_episode']):+.3f}"
                f"  episodes {float(m['episodes_finished']):.0f}"
                f"  clip {float(m['clip_frac']):.3f}"
                f"  env-steps/s {steps_done / dt:.3g}",
                flush=True,
            )
    jax.block_until_ready(carry[0])
    dt = time.time() - t0
    print(f"total: {steps_done} env-steps in {dt:.1f}s = "
          f"{steps_done / dt:.3g} env-steps/s (incl. compile)")
    if args.save:
        print(f"saved {ckpt.save_state(args.save, tuple(carry))}")
    if args.export_params:
        if args.arch not in ("ga3c", "drl_long"):
            sys.exit("--export-params requires --arch ga3c or drl_long")
        np.savez(args.export_params,
                 **{k: np.asarray(v) for k, v in carry[0].items()})
        print(f"exported {args.export_params}")


if __name__ == "__main__":
    main()
