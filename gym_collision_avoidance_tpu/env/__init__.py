from gym_collision_avoidance_tpu.env.step import env_step, env_reset

__all__ = ["env_step", "env_reset"]
