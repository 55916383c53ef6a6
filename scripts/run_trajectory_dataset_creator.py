"""CLI: RVO trajectory dataset (mirrors the reference's
experiments/src/run_trajectory_dataset_creator.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trajs", type=int, default=100)
    ap.add_argument("--out", default="datasets/trajs/rvo_trajs.p")
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

    trajs = datasets.collect_trajectory_dataset(
        num_trajs=args.trajs, out_path=args.out
    )
    print(f"wrote {args.out} ({len(trajs)} trajectories)")
    return True


if __name__ == "__main__":
    main()
