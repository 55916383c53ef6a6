"""Device-mesh sharding of the env batch.

The reference has **no** parallelism at all (a serial, unused ``DummyVecEnv``
Python loop, ``envs/vec_env.py:86-159``).  Here data parallelism over envs is
the primary scale axis (SURVEY.md §2.3): the env-state pytree gets a leading
``[num_envs]`` axis, `vmap` steps all envs in lockstep, and the env axis is
sharded across a 1-D ``("env",)`` device mesh with ``NamedSharding``.  Steps
are embarrassingly parallel — cross-device traffic is limited to metric
reductions (``psum``) and host transfers.

Model parallelism (TP/PP/SP/EP) is deliberately absent: the frozen policy
nets are <= 2 MB and replicated per device (SURVEY.md §2.3 item 3).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gym_collision_avoidance_tpu.config import EnvConfig
from gym_collision_avoidance_tpu.core.state import EnvState
from gym_collision_avoidance_tpu.env.batch import batched_env_step
from gym_collision_avoidance_tpu.env.step import env_step
from gym_collision_avoidance_tpu.obs import spec as obs_spec
from gym_collision_avoidance_tpu.policies import registry as policies


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "env") -> Mesh:
    """1-D mesh over the available devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def env_sharding(mesh: Mesh, axis_name: str = "env") -> NamedSharding:
    """Shard the leading [num_envs] axis of every leaf across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_batch(states: EnvState, mesh: Mesh, axis_name: str = "env") -> EnvState:
    """Place a [E, ...]-leaved EnvState with the env axis sharded."""
    sh = env_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), states)


def stack_states(state_list) -> EnvState:
    """Stack single-env states into an [E, ...] batch."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *state_list)


def make_batched_step(
    cfg: EnvConfig,
    active_policies: Tuple[int, ...] = (policies.NONCOOP,),
    sensors: Tuple[str, ...] = ("other_agents_states",),
    states_in_obs: Tuple[str, ...] = obs_spec.DEFAULT_STATES_IN_OBS,
    has_external: bool = False,
    donate: bool = True,
):
    """Build a jitted step over an [E, A, ...] env batch.

    Returns a function ``(states, ext_actions?, params?) ->
    (states, obs, rewards, game_over[E], info)``.
    """

    if has_external:
        def stepper(states, ext_actions, params=None):
            return batched_env_step(
                states, ext_actions, cfg, params, active_policies, sensors,
                states_in_obs,
            )
    else:
        def stepper(states, params=None):
            return batched_env_step(
                states, None, cfg, params, active_policies, sensors,
                states_in_obs,
            )

    return jax.jit(stepper, donate_argnums=(0,) if donate else ())


def make_batched_rollout(
    cfg: EnvConfig,
    num_steps: int,
    active_policies: Tuple[int, ...] = (policies.NONCOOP,),
    sensors: Tuple[str, ...] = ("other_agents_states",),
    states_in_obs: Tuple[str, ...] = obs_spec.DEFAULT_STATES_IN_OBS,
    mesh: Optional[Mesh] = None,
):
    """Build a jitted ``lax.scan`` rollout over the env batch, returning only
    O(1)-size reduced metrics per step (the bench / eval hot loop: nothing
    large leaves the device)."""

    def body(states, _):
        states, _obs, rewards, game_over, _info = batched_env_step(
            states, None, cfg, None, active_policies, sensors, states_in_obs
        )
        metrics = {
            "mean_reward": jnp.mean(rewards),
            "done_frac": jnp.mean(game_over.astype(jnp.float32)),
        }
        return states, metrics

    def run(states):
        return jax.lax.scan(body, states, None, length=num_steps)

    if mesh is not None:
        # one sharding applies to every leaf (pytree-prefix semantics)
        sh = env_sharding(mesh)
        return jax.jit(run, in_shardings=sh, donate_argnums=(0,))
    return jax.jit(run, donate_argnums=(0,))
