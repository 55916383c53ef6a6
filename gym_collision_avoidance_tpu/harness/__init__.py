from gym_collision_avoidance_tpu.harness import runner, experiments, registry, visualize

__all__ = ["runner", "experiments", "registry", "visualize"]
