"""CLI: the full evaluation campaign (mirrors the reference's
experiments/src/run_full_test_suite.py + run_full_test_suite.sh).

Usage:
  python scripts/run_full_test_suite.py [--policies CADRL RVO GA3C-CADRL-10]
      [--agents 2 3 4] [--cases 500] [--out results/full_test_suites]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--policies", nargs="+",
                    default=["CADRL", "RVO", "GA3C-CADRL-10"])
    ap.add_argument("--agents", nargs="+", type=int, default=[2, 3, 4])
    ap.add_argument("--cases", type=int, default=500)
    ap.add_argument("--out", default="results/full_test_suites")
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

    results = experiments.run_full_test_suite(
        policies_to_test=tuple(args.policies),
        num_agents_to_test=tuple(args.agents),
        num_test_cases=args.cases,
        out_dir=args.out,
        record_pickle_files=True,
    )
    summary = experiments.summarize_suite(results)
    print(summary.to_string(index=False))
    os.makedirs(args.out, exist_ok=True)
    summary.to_csv(os.path.join(args.out, "summary.csv"), index=False)
    print(f"wrote {args.out}/summary.csv")
    return True


if __name__ == "__main__":
    main()
