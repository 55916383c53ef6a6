from gym_collision_avoidance_tpu.policies import registry
from gym_collision_avoidance_tpu.policies import ga3c  # registers GA3C_CADRL kernel
from gym_collision_avoidance_tpu.policies import cadrl  # registers CADRL kernel
from gym_collision_avoidance_tpu.policies import rvo  # registers RVO kernel
from gym_collision_avoidance_tpu.policies import drl_long  # registers DRL_LONG kernel
from gym_collision_avoidance_tpu.policies.registry import (
    EXTERNAL,
    STATIC,
    NONCOOP,
    LEARNING,
    LEARNING_GA3C,
    CARRL,
    GA3C_CADRL,
    CADRL,
    RVO,
    POLICY_NAMES,
    compute_actions,
)

__all__ = [
    "registry",
    "EXTERNAL",
    "STATIC",
    "NONCOOP",
    "LEARNING",
    "LEARNING_GA3C",
    "CARRL",
    "GA3C_CADRL",
    "CADRL",
    "RVO",
    "POLICY_NAMES",
    "compute_actions",
]
