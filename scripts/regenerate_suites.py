"""Regenerate the frozen 500-case test-suite pickles.

Mirrors the reference's seeded suite regeneration
(``envs/test_cases.py:1044-1098``): fixed np.random seed, 500 cases of
generate_rand_test_case_multi per agent count.  Because our generator
consumes the identical np.random stream, the output pickles match the
reference's byte-for-byte content-wise.

Usage: python scripts/regenerate_suites.py [out_dir]
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gym_collision_avoidance_tpu.scenarios import random_cases


def main(out_dir="test_cases", seed=0, num_test_cases=500,
         agent_counts=(2, 3, 4), side_length=4,
         speed_bnds=(1.0, 1.0), radius_bnds=(0.1, 0.1)):
    os.makedirs(out_dir, exist_ok=True)
    for num_agents in agent_counts:
        np.random.seed(seed)
        cases = [
            random_cases.generate_rand_test_case_multi(
                num_agents, side_length, list(speed_bnds), list(radius_bnds)
            )
            for _ in range(num_test_cases)
        ]
        if tuple(speed_bnds) == (1.0, 1.0):
            prefix = f"vpref1.0_r{radius_bnds[0]}-{radius_bnds[1]}/"
            os.makedirs(os.path.join(out_dir, prefix.rstrip("/")), exist_ok=True)
        else:
            prefix = ""
        path = os.path.join(
            out_dir, f"{prefix}{num_agents}_agents_{num_test_cases}_cases_seed{seed:03d}.p"
        )
        with open(path, "wb") as f:
            pickle.dump(cases, f)
        print(f"wrote {path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
