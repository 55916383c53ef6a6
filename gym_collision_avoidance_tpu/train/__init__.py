"""On-device RL training for the LearningPolicy path.

The reference exists to serve external RL training through its gym loop
(envs/collision_avoidance_env.py:208-218 + LearningPolicy.py:5-35); the
reference repo itself ships no trainer.  This package supplies the
TPU-native one: rollout, advantage estimation, and optimization all run
inside jit, data-parallel over a device mesh.
"""

from gym_collision_avoidance_tpu.train.ppo import (  # noqa: F401
    PPOConfig,
    compute_gae,
    init_actor_critic,
    make_ppo,
    make_sharded_ppo,
)
