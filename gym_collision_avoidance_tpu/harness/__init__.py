from gym_collision_avoidance_tpu.harness import runner, experiments, registry, serving, visualize

__all__ = ["runner", "experiments", "registry", "serving", "visualize"]
