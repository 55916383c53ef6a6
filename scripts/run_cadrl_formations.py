"""CLI: the letter-formations demo (mirrors the reference's
experiments/src/run_cadrl_formations.py): 6 GA3C-CADRL agents spell
C-A-D-R-L, persisting across episodes, with plots (and optional GIFs)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--policy", default="GA3C-CADRL-10")
    ap.add_argument("--episodes", type=int, default=5)
    ap.add_argument("--out", default="results/cadrl_formations")
    ap.add_argument("--animate", action="store_true")
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

    out = experiments.run_formations_campaign(
        policy=args.policy, num_episodes=args.episodes,
        out_dir=args.out, animate=args.animate,
    )
    for letter, stats, _traj in out:
        print(f"{letter}: {stats['outcome']} in {stats['steps']} steps")
    return True


if __name__ == "__main__":
    main()
