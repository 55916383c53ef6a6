"""TPU-native multi-agent collision-avoidance engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``mit-acl/gym-collision-avoidance`` (reference mounted at /root/reference).

Design stance (vs the reference's object-graph-per-agent architecture,
``envs/agent.py``, ``envs/collision_avoidance_env.py``):

* All env state lives in one struct-of-arrays pytree :class:`EnvState`
  with ``[num_agents, ...]`` leaves (batch over envs via ``jax.vmap`` /
  sharded meshes, see :mod:`gym_collision_avoidance_tpu.parallel`).
* One pure, jit-compiled function steps every agent of every env in
  lockstep; per-agent heterogeneity (policy / dynamics) is expressed as
  integer type-id arrays + masked compute, not Python dispatch.
* Policies are pure functions ``(obs, state, params) -> action`` over the
  whole agent batch; frozen network weights are JAX pytrees.
"""

from gym_collision_avoidance_tpu.config import EnvConfig
from gym_collision_avoidance_tpu.core.state import EnvState
from gym_collision_avoidance_tpu.env.step import env_step, env_reset

__version__ = "0.1.0"


def _register_gym_ids():
    """Import-time gym registration, matching the reference
    (gym_collision_avoidance/__init__.py:2-9 registers
    CollisionAvoidance-v0 on package import).  Entry points are given as
    strings so gymnasium defers importing the env class (and matplotlib)
    until ``gym.make``."""
    try:
        from gymnasium.envs.registration import register, registry
    except Exception:  # pragma: no cover - gymnasium not installed
        return
    for env_id in ("CollisionAvoidance-v0", "CollisionAvoidanceTpu-v0"):
        if env_id not in registry:
            register(
                id=env_id,
                entry_point="gym_collision_avoidance_tpu.env.gymapi:CollisionAvoidanceEnv",
                disable_env_checker=True,
            )


_register_gym_ids()

__all__ = [
    "EnvConfig",
    "EnvState",
    "env_step",
    "env_reset",
]
