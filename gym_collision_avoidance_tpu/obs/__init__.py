from gym_collision_avoidance_tpu.obs import sensors, spec

__all__ = ["sensors", "spec"]
