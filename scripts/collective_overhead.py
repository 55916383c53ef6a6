"""Measured collective-overhead breakdown for the DP scaling design.

VERDICT r2 item 5 asked for the ICI case to be argued quantitatively:
"a measured collective-overhead breakdown (bytes/step psum vs step time)".
This script measures, on an N-device mesh (virtual CPU or real TPU):

1. **Traffic accounting** (exact, from the program text): bytes moved by
   collectives per rollout step and per PPO train step.  The rollout's
   only collectives are one pmean + one psum of the scan-stacked
   [num_steps] metric vectors per dispatch — 8 B per env step amortized
   (parallel/distributed.py:make_distributed_rollout); DP-PPO adds one
   gradient pmean + 4 scalar pmeans per minibatch and 5 scalar metric
   pmeans per train step (train/ppo.py:_pmean call sites).

2. **Measured per-collective cost**: a jitted shard_map scan of K
   back-to-back pmeans of (a) a grad-sized pytree and (b) one scalar,
   timed against the same scan with the pmean replaced by an identity —
   isolating the collective from dispatch and loop overhead.

3. **Measured end-to-end overhead**: the sharded PPO train step with its
   pmeans versus the identical program with every pmean compiled out
   (``axis_name=None`` under the same shard_map; training-incorrect,
   timing-only), at fixed total work.

4. **ICI projection**: combines the exact traffic count with the
   measured on-chip step times (PERF.md) and published v5e ICI numbers
   (jax-ml.github.io/scaling-book: ~4.5e10 B/s one-way per link, ~1 us
   collective latency) into a predicted multi-chip efficiency for the
   >=85 % north-star target (BASELINE.md).

Usage:
    python scripts/collective_overhead.py --virtual 4 [--append SCALING.md]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--virtual", type=int, default=None,
                   help="force N virtual CPU devices (test mode)")
    p.add_argument("--envs", type=int, default=8192,
                   help="global env count for the traffic accounting")
    p.add_argument("--ppo-envs", type=int, default=256,
                   help="global env count for the measured PPO A/B")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--pmean-calls", type=int, default=256,
                   help="back-to-back pmeans per timed dispatch")
    p.add_argument("--append", default=None,
                   help="append the markdown section to this file")
    args = p.parse_args(argv)

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)

    if args.virtual:
        flags = [
            f for f in os.environ.get("XLA_FLAGS", "").split()
            if not f.startswith("--xla_force_host_platform_device_count")
        ]
        flags.append(f"--xla_force_host_platform_device_count={args.virtual}")
        os.environ["XLA_FLAGS"] = " ".join(flags)
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gym_collision_avoidance_tpu.parallel import distributed as dist
    from gym_collision_avoidance_tpu.train import (
        PPOConfig, make_ppo, make_sharded_ppo,
    )

    devices = jax.devices()
    D = len(devices)
    mesh = dist.global_mesh(devices=devices)
    cores = os.cpu_count()
    print(f"devices={D} ({devices[0].device_kind}), physical cores={cores}")

    # ---- 1. exact traffic accounting -------------------------------------
    ppo_cfg = PPOConfig(num_envs=args.ppo_envs, horizon=16, num_agents=4,
                        epochs=2, num_minibatches=2)
    _ts, init_fn, obs_dim = make_ppo(ppo_cfg)
    params = init_fn(jax.random.PRNGKey(0))[0]
    grad_bytes = sum(
        int(np.prod(x.shape)) * x.dtype.itemsize
        for x in jax.tree.leaves(params)
    )
    n_mb = ppo_cfg.epochs * ppo_cfg.num_minibatches
    # per minibatch: 1 grad pmean + 3 scalar pmeans (wsum, mu, var at
    # train/ppo.py:503-505; the pmean inside global-norm clipping is
    # absent: clipping uses the already-pmeaned grads); per train step:
    # 5 scalar metric pmeans (ppo.py:528-535, one of them CSE-able).
    n_scalar = n_mb * 3 + 5
    ppo_coll_bytes = n_mb * (grad_bytes + 3 * 4) + 5 * 4
    rollout_coll_bytes = 2 * 4  # two f32 entries per env step, amortized
    # (the dispatch reduces two stacked [S] vectors, i.e. 8*S bytes per
    # S-step dispatch)
    traffic = {
        "grad_bytes": grad_bytes,
        "param_count": grad_bytes // 4,
        "minibatches_per_train_step": n_mb,
        "ppo_collective_bytes_per_train_step": ppo_coll_bytes,
        "rollout_collective_bytes_per_env_step": rollout_coll_bytes,
    }
    print(json.dumps(traffic))

    # ---- 2. measured per-collective cost ---------------------------------
    from gym_collision_avoidance_tpu.parallel.distributed import shard_map

    K = args.pmean_calls

    def timed(fn, x):
        fn(x)  # compile + warmup
        jax.block_until_ready(fn(x))
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x))
            best = min(best, time.perf_counter() - t0)
        return best

    def make_chain(collective):
        """scan of K bodies; each body perturbs then (maybe) pmeans, so
        XLA cannot CSE the K collectives away."""

        def body(c, _):
            c = jax.tree.map(lambda v: v * 1.000001, c)
            c = collective(c)
            return c, ()

        def run(x):
            y, _ = lax.scan(body, x, None, length=K)
            return y

        return jax.jit(
            shard_map(run, mesh=mesh, in_specs=P(), out_specs=P(),
                      check_vma=False)
        )

    axis = mesh.axis_names[0]
    rep = NamedSharding(mesh, P())
    gx = jax.device_put(params, rep)
    sx = jax.device_put(jnp.float32(1.0), rep)

    rows = []
    for name, x in (("grad pytree (%d B)" % grad_bytes, gx),
                    ("one f32 scalar", sx)):
        t_with = timed(make_chain(lambda c: jax.tree.map(
            lambda v: lax.pmean(v, axis), c)), x)
        t_base = timed(make_chain(lambda c: c), x)
        per_call_us = (t_with - t_base) / K * 1e6
        rows.append({"payload": name, "per_pmean_us": round(per_call_us, 2),
                     "chain_with_s": round(t_with, 4),
                     "chain_base_s": round(t_base, 4)})
        print(json.dumps(rows[-1]))

    # ---- 3. measured end-to-end PPO overhead -----------------------------
    def make_variant(axis_name):
        local = dataclasses.replace(ppo_cfg,
                                    num_envs=ppo_cfg.num_envs // D)
        tstep, _i, _ = make_ppo(local, axis_name=axis_name)
        env_spec = P(axis)
        return jax.jit(
            shard_map(
                tstep, mesh=mesh,
                in_specs=(P(), P(), env_spec, env_spec, env_spec, P()),
                out_specs=(P(), P(), env_spec, env_spec, env_spec, P()),
                check_vma=False,
            )
        )

    _tg, init_g, _ = make_ppo(ppo_cfg)
    carry0 = init_g(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    ppo_rows = []
    for label, axis_name in (("with pmean", axis),
                             ("pmean compiled out (timing-only)", None)):
        step = make_variant(axis_name)
        carry = list(carry0)
        *carry, _m = step(*carry, rng)
        jax.block_until_ready(carry[0])
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            *carry, _m = step(*carry, rng)
            jax.block_until_ready(carry[0])
            best = min(best, time.perf_counter() - t0)
        ppo_rows.append({"variant": label, "train_step_s": round(best, 5)})
        print(json.dumps(ppo_rows[-1]))
    overhead_s = ppo_rows[0]["train_step_s"] - ppo_rows[1]["train_step_s"]
    # Attribution check against the microbench (NOT a per-collective
    # division: the step has n_mb grad pmeans AND n_scalar scalar pmeans,
    # and end-to-end overhead also includes scheduling effects the
    # microbench can't see).
    per_grad_us = rows[0]["per_pmean_us"]
    per_scalar_us = rows[1]["per_pmean_us"]
    predicted_us = n_mb * per_grad_us + n_scalar * per_scalar_us
    print(f"measured collective overhead: {overhead_s * 1e3:.2f} ms/train "
          f"step ({n_mb} grad + {n_scalar} scalar pmeans; microbench "
          f"predicts {predicted_us / 1e3:.2f} ms)")

    # ---- 4. ICI projection -------------------------------------------------
    # v5e ring all-reduce of G bytes over D chips in a 1-D ring:
    # bandwidth term 2*G*(D-1)/D / W_ici (reduce-scatter + all-gather,
    # each (D-1)/D of the bytes over the slowest link), latency term
    # ~2*(D-1) hops * LAT.  W_ici ~= 4.5e10 B/s one-way per link and
    # LAT ~= 1 us per hop (scaling-book v5e figures).  NOT scale-free:
    # the latency term grows linearly in D, so efficiency is reported
    # per device count instead of as a single number.
    W_ICI = 4.5e10
    LAT = 1e-6

    def allreduce_s(nbytes, d):
        return 2 * (d - 1) * LAT + 2 * nbytes * (d - 1) / d / W_ICI

    # measured on-chip step times (PERF.md round-3 rows)
    serving_step_s = 8192 / 3.26e7       # headline serving, E=8192
    ppo_step_s = 2048 * 16 / 4.15e6      # ppo_train E=2048 T=16
    proj_rows = []
    for d in (8, 64, 256):
        grad_s = allreduce_s(grad_bytes, d)
        scalar_s = allreduce_s(4, d)
        train_ovh = n_mb * (grad_s + 3 * scalar_s) + 5 * scalar_s
        # serving: 1 pmean + 1 psum of the stacked [S] metric vectors per
        # dispatch; per step amortized it is 2 collectives / S steps, but
        # the latency is paid once per dispatch — charge the whole
        # dispatch cost against S=128 steps of work.
        serve_ovh = 2 * allreduce_s(4 * 128, d) / 128
        proj_rows.append({
            "devices": d,
            "ici_allreduce_grad_us": grad_s * 1e6,
            "ppo_ici_overhead_us": train_ovh * 1e6,
            "ppo_projected_efficiency": ppo_step_s / (ppo_step_s + train_ovh),
            "serving_projected_efficiency": serving_step_s
            / (serving_step_s + serve_ovh),
        })
        print(json.dumps({k: (float(f"{v:.6g}") if isinstance(v, float)
                              else v) for k, v in proj_rows[-1].items()}))

    if args.append:
        lines = [
            "",
            "## Measured collective overhead (scripts/collective_overhead.py)",
            "",
            f"Mesh: {D} devices ({devices[0].device_kind}), "
            f"{cores} physical cores.",
            "",
            "Exact per-step collective traffic (from the program text):",
            "",
            "| program | collectives | bytes/step |",
            "|---|---|---:|",
            "| rollout (make_distributed_rollout) | 1 pmean + 1 psum of "
            "the stacked [S] metric vectors per DISPATCH (8 B/step "
            f"amortized) | {rollout_coll_bytes} |",
            f"| PPO train step (E={ppo_cfg.num_envs}, T={ppo_cfg.horizon}, "
            f"{ppo_cfg.epochs}x{ppo_cfg.num_minibatches} minibatches) | "
            f"{n_mb} grad pmeans ({grad_bytes} B = {grad_bytes // 4} params "
            f"f32) + {n_scalar} scalar pmeans | {ppo_coll_bytes} |",
            "",
            f"Measured per-pmean cost ({K}-deep scan chain minus identity "
            f"chain, best of {args.reps}):",
            "",
            "| payload | per-pmean |",
            "|---|---:|",
        ]
        for r in rows:
            lines.append(f"| {r['payload']} | {r['per_pmean_us']:.2f} us |")
        lines += [
            "",
            "Measured end-to-end: the sharded PPO train step vs the same "
            "program with every pmean compiled out (timing-only variant):",
            "",
            "| variant | train-step wall |",
            "|---|---:|",
        ]
        for r in ppo_rows:
            lines.append(f"| {r['variant']} | {r['train_step_s'] * 1e3:.2f} ms |")
        lines += [
            "",
            f"-> total collective cost {overhead_s * 1e3:.2f} ms per train "
            f"step ({n_mb} grad + {n_scalar} scalar pmeans; the microbench "
            f"rows above predict {predicted_us / 1e3:.2f} ms of that).",
            "",
            "### ICI projection for the >=85 % target",
            "",
            "Ring all-reduce model (NOT scale-free — the latency term "
            "grows with device count): time(G, D) = 2(D-1)*1us + "
            "2G(D-1)/D / 45 GB/s (scaling-book v5e one-way link figures). "
            f"Per PPO train step: {n_mb} grad pmeans ({grad_bytes} B each) "
            f"+ {n_scalar} scalar pmeans, vs the measured "
            f"{ppo_step_s * 1e3:.1f} ms on-chip step (PERF.md ppo_train "
            "row); serving pays 2 small collectives per 128-step dispatch:",
            "",
            "| devices | grad all-reduce | PPO ICI/step | PPO DP eff. | "
            "serving eff. |",
            "|---:|---:|---:|---:|---:|",
        ]
        for r in proj_rows:
            lines.append(
                f"| {r['devices']} | {r['ici_allreduce_grad_us']:.1f} us | "
                f"{r['ppo_ici_overhead_us']:.1f} us | "
                f"{r['ppo_projected_efficiency'] * 100:.2f} % | "
                f"{r['serving_projected_efficiency'] * 100:.3f} % |"
            )
        ppo_ok = [r["devices"] for r in proj_rows
                  if r["ppo_projected_efficiency"] >= 0.85]
        ppo_bad = [r["devices"] for r in proj_rows
                   if r["ppo_projected_efficiency"] < 0.85]
        lines += [
            "",
            "Serving clears the >=85 % north star at every tabulated "
            f"scale.  PPO at THIS step size (E=2048, T=16, "
            f"{ppo_step_s * 1e3:.1f} ms/step) clears it at "
            f"D={ppo_ok} but falls below at D={ppo_bad}: the 2(D-1)-hop "
            "latency term grows linearly with the ring, so holding 85 % "
            "at larger D requires growing per-device work — e.g. at "
            f"D=256 the step must be >= "
            f"{proj_rows[-1]['ppo_ici_overhead_us'] * 0.85 / 0.15 / 1e3:.0f}"
            " ms (larger E or T), or the mesh must be 2-D/3-D torus "
            "(fewer hops) — NOT 'by construction at any scale' as earlier "
            "revisions claimed.",
            "",
        ]
        with open(args.append, "a") as f:
            f.write("\n".join(lines))
        print(f"appended to {args.append}")


if __name__ == "__main__":
    main()
