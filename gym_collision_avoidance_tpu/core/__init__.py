from gym_collision_avoidance_tpu.core.state import EnvState
from gym_collision_avoidance_tpu.core import maths, dynamics

__all__ = ["EnvState", "maths", "dynamics"]
