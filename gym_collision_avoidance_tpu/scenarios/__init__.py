from gym_collision_avoidance_tpu.scenarios.presets import (
    Scenario,
    two_agents_swap,
    circle_scenario,
    preset_two_agent_cases,
)

__all__ = [
    "Scenario",
    "two_agents_swap",
    "circle_scenario",
    "preset_two_agent_cases",
]
