"""Minimum working example, mirroring the reference's
experiments/src/example.py: 2 agents — one driven by external actions, one
running GA3C-CADRL — with a trajectory plot saved at the end."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.env.gymapi import CollisionAvoidanceEnv
from gym_collision_avoidance_tpu.models import ga3c_cadrl
from gym_collision_avoidance_tpu.policies import registry as P
from gym_collision_avoidance_tpu.scenarios import presets


def main():
    cfg = EnvConfig.evaluate(
        dtype="float32",
        max_num_other_agents_observed=19,
        agent_sorting_method="closest_last",
    )
    sc = presets.two_agents_swap()
    sc.policy_id = np.array([P.LEARNING, P.GA3C_CADRL], np.int32)

    env = CollisionAvoidanceEnv(
        cfg=cfg, scenario=sc, params={"ga3c_cadrl": ga3c_cadrl.load_params()}
    )
    env.set_plot_save_dir(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "results", "example")
    )

    obs, _ = env.reset()
    for i in range(100):
        # the external agent gets its action from this script
        actions = {0: np.array([1.0, 0.5])}
        obs, rewards, terminated, truncated, info = env.step(actions)
        if terminated:
            print("All agents finished!")
            break
    path = env.plot_episode()
    print(f"saved {path}")
    return True


if __name__ == "__main__":
    main()
    print("Experiment over.")
