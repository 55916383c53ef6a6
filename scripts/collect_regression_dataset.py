"""CLI: CADRL regression dataset (mirrors the reference's
experiments/src/collect_regression_dataset.py): (state, action, value)
triples pickled for train/test."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", type=int, default=100000)
    ap.add_argument("--test", type=int, default=20000)
    ap.add_argument("--agents", type=int, default=4)
    ap.add_argument("--out", default="datasets/regression")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from gym_collision_avoidance_tpu.utils.jaxcache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from gym_collision_avoidance_tpu.harness import datasets

    for mode, n in [("train", args.train), ("test", args.test)]:
        path = os.path.join(
            args.out,
            f"{args.agents}_agents_cadrl_dataset_action_value_{mode}.p",
        )
        datasets.collect_regression_dataset(
            n, num_agents=args.agents, seed=0 if mode == "train" else 1,
            out_path=path,
        )
        print(f"wrote {path}")
    return True


if __name__ == "__main__":
    main()
