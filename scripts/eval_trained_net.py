"""Evaluate a trained GA3C-architecture checkpoint on the frozen suites.

Registers the .npz (from ``train_ppo.py --export-params``) as a named
policy and runs the full 500-case evaluation campaign at the given
densities — the same pipeline the shipped checkpoints are scored with
(mirrors the reference's run_full_test_suite.py:54-130 loop).

Usage:
  python scripts/eval_trained_net.py CKPT.npz [--agents 2 3 4 5 6 8 10]
      [--cases 500] [--cpu] [--out results/eval]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--agents", nargs="+", type=int,
                    default=[2, 3, 4, 5, 6, 8, 10])
    ap.add_argument("--cases", type=int, default=500)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from gym_collision_avoidance_tpu.utils.jaxcache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from gym_collision_avoidance_tpu.harness import experiments
    from gym_collision_avoidance_tpu.harness import registry as hreg

    name = os.path.splitext(os.path.basename(args.ckpt))[0]
    hreg.register_trained_policy(name, args.ckpt)
    results = experiments.run_full_test_suite(
        policies_to_test=(name,),
        num_agents_to_test=tuple(args.agents),
        num_test_cases=args.cases,
        out_dir=args.out,
        record_pickle_files=args.out is not None,
    )
    summary = experiments.summarize_suite(results)
    print(summary.to_string(index=False))
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        summary.to_csv(os.path.join(args.out, f"{name}_summary.csv"),
                       index=False)
    return True


if __name__ == "__main__":
    main()
