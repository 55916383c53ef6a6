"""Named-policy registry for experiments.

Shrunk to the checkpoints actually shipped with the reference (the
reference registry, ``experiments/src/env_utils.py:102-492``, also lists
dozens of paper-ablation entries with hard-coded EC2 paths that don't
resolve anywhere — those are dead and not reproduced).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

from gym_collision_avoidance_tpu.config import EnvConfig
from gym_collision_avoidance_tpu.policies import registry as policies


@dataclasses.dataclass(frozen=True)
class PolicySpec:
    policy_id: int
    sensors: Tuple[str, ...] = ("other_agents_states",)
    # sensor args become env-config overrides (the reference passes them to
    # Sensor.set_args per agent; here sensing is env-level config)
    agent_sorting_method: Optional[str] = None
    max_num_other_agents_observed: Optional[int] = None
    needs_params: Tuple[str, ...] = ()


POLICY_SPECS: Dict[str, PolicySpec] = {
    # env_utils.py:464-473
    "GA3C-CADRL-10": PolicySpec(
        policy_id=policies.GA3C_CADRL,
        agent_sorting_method="closest_last",
        max_num_other_agents_observed=19,
        needs_params=("ga3c_cadrl",),
    ),
    # env_utils.py:481-488
    "CADRL": PolicySpec(policy_id=policies.CADRL, needs_params=("cadrl",)),
    "RVO": PolicySpec(policy_id=policies.RVO),
    "noncoop": PolicySpec(policy_id=policies.NONCOOP),
    "static": PolicySpec(policy_id=policies.STATIC),
}


def load_params(*param_keys: str) -> dict:
    """Load the converted frozen checkpoints named in ``needs_params``."""
    params = {}
    for key in set(param_keys):
        if key == "ga3c_cadrl":
            from gym_collision_avoidance_tpu.models import ga3c_cadrl

            params[key] = ga3c_cadrl.load_params()
        elif key == "cadrl":
            from gym_collision_avoidance_tpu.models import cadrl

            params[key] = cadrl.load_params()
        else:
            raise KeyError(f"unknown param set {key}")
    return params


def cfg_for_policy(name: str, base_cfg: EnvConfig) -> EnvConfig:
    """Apply a named policy's sensor args to the env config (the analog of
    ``sensor.set_args(...)`` in ``reset_env``, env_utils registry)."""
    spec = POLICY_SPECS[name]
    overrides = {}
    if spec.agent_sorting_method is not None:
        overrides["agent_sorting_method"] = spec.agent_sorting_method
    if spec.max_num_other_agents_observed is not None:
        overrides["max_num_other_agents_observed"] = spec.max_num_other_agents_observed
    return base_cfg.replace(**overrides) if overrides else base_cfg
