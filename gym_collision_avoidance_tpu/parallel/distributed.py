"""Multi-host distributed runtime for the env batch.

The reference's only "distributed backend" is a serial Python
``DummyVecEnv`` loop (``envs/vec_env.py:6-191``, never parallel).  Here the
env batch scales across *hosts x devices* the TPU-pod way:

  * every host process calls :func:`init_distributed`
    (``jax.distributed.initialize``) so all hosts join one JAX runtime and
    see the global device list;
  * a 1-D ``("env",)`` :func:`global_mesh` spans every device of every
    host — env data parallelism is the scale axis (SURVEY.md §2.3), so a
    flat mesh keeps the layout trivial and all collectives are simple
    reductions that XLA routes over ICI within a host and DCN across
    hosts;
  * each host materializes only its *local* slice of the env batch
    (:func:`host_local_batch` + ``jax.make_array_from_process_local_data``)
    — the global [E, ...] array never exists on a single host;
  * the rollout loop (:func:`make_distributed_rollout`) runs under
    ``shard_map`` with **explicit** ``lax.pmean`` / ``lax.psum`` metric
    reductions over the env axis, so the cross-host traffic is exactly
    two [num_steps] vectors per *dispatch* and visible in the program
    text.  The reductions sit OUTSIDE the step scan: each step computes
    its local scalar metrics, the scan stacks them, and one
    pmean/psum of the stacked [num_steps] arrays reduces them across
    devices — bit-identical to reducing per step (the collective
    commutes with the stacking), but 2 collectives per dispatch instead
    of 2*num_steps.  On real ICI that saves (2S-2) launch latencies; on
    the virtual CPU mesh (where each collective is a host-side
    rendezvous) it is the difference between weak scaling collapsing
    and staying flat (SCALING.md).

Single-process use (tests, the one-chip axon tunnel) goes through the same
code path: ``init_distributed()`` is a no-op when no coordinator is
configured, and the "multi-host" mesh is just the local device mesh.

Launch: ``scripts/launch_multihost.py`` (one process per host; a
``--spawn N`` mode demonstrates the full coordinator handshake with N
local CPU processes).  Scaling measurements: ``scripts/scaling_bench.py``
-> ``SCALING.md``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gym_collision_avoidance_tpu.config import EnvConfig
from gym_collision_avoidance_tpu.core.state import EnvState
from gym_collision_avoidance_tpu.env.batch import batched_env_step
from gym_collision_avoidance_tpu.obs import spec as obs_spec
from gym_collision_avoidance_tpu.policies import registry as policies

try:  # stable API, jax >= 0.6
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> bool:
    """Join the multi-host JAX runtime (``jax.distributed.initialize``).

    Call once per host process before any other JAX operation.  With no
    arguments and no ``JAX_COORDINATOR_ADDRESS`` environment, this is a
    no-op (single-process mode) — so library code can call it
    unconditionally.

    Returns True if a multi-process runtime was initialized.
    """
    import os

    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    if num_processes is None:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def global_mesh(axis_name: str = "env", devices=None) -> Mesh:
    """1-D mesh over every device of every host (after
    :func:`init_distributed`, ``jax.devices()`` is the global list)."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def process_env_slice(num_envs_global: int, mesh: Mesh) -> Tuple[int, int]:
    """(start, count) of this host's slice of the global env axis.

    The env axis is laid out mesh-major, so a host owns the contiguous
    rows corresponding to its local devices' mesh positions.
    """
    n_dev = mesh.devices.size
    if num_envs_global % n_dev:
        raise ValueError(
            f"num_envs_global={num_envs_global} must divide the "
            f"{n_dev}-device mesh"
        )
    per_dev = num_envs_global // n_dev
    local_positions = [
        i for i, d in enumerate(mesh.devices.flat) if d.process_index == jax.process_index()
    ]
    if not local_positions:
        return 0, 0
    start = min(local_positions) * per_dev
    count = len(local_positions) * per_dev
    return start, count


def host_local_batch(build_fn, num_envs_global: int, mesh: Mesh) -> EnvState:
    """Assemble the globally-sharded env batch from host-local pieces.

    Args:
        build_fn: ``(global_env_index) -> EnvState`` pytree for one env
            (host code; called only for this host's slice).
        num_envs_global: total env count across all hosts.
        mesh: the :func:`global_mesh`.

    Returns:
        An EnvState whose leaves are global jax.Arrays sharded ``P("env")``
        over the mesh; each host only ever held its own slice in memory.
    """
    start, count = process_env_slice(num_envs_global, mesh)
    local_states = [build_fn(start + i) for i in range(count)]
    local = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *local_states)
    sharding = NamedSharding(mesh, P("env"))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, x, (num_envs_global,) + x.shape[1:]
        ),
        local,
    )


def replicate_global(tree, mesh: Mesh):
    """Replicate a (small) pytree — e.g. policy params — on every device."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x), np.shape(x)
        ),
        tree,
    )


def make_distributed_rollout(
    cfg: EnvConfig,
    num_steps: int,
    mesh: Mesh,
    active_policies: Tuple[int, ...] = (policies.NONCOOP,),
    sensors: Tuple[str, ...] = ("other_agents_states",),
    states_in_obs: Tuple[str, ...] = obs_spec.DEFAULT_STATES_IN_OBS,
    axis_name: str = "env",
    with_params: bool = False,
):
    """Jitted ``shard_map`` rollout over the global env batch.

    Every device steps its local env shard; metrics are reduced with
    explicit ``lax.pmean`` / ``lax.psum`` over the env axis — the only
    cross-device communication in the program.  The reductions run once
    per dispatch on the scan-stacked [num_steps] metric vectors (NOT per
    step): identical values, 2 collectives instead of 2*num_steps.

    Returns ``run(states[, params]) -> (final_states, metrics)`` where
    ``metrics`` leaves are fully-replicated [num_steps] arrays.
    """

    def body(states, params, _):
        states, _obs, rewards, game_over, _info = batched_env_step(
            states, None, cfg, params, active_policies, sensors, states_in_obs
        )
        # local per-step scalars; the cross-device reduction happens once
        # on the stacked [num_steps] vectors after the scan
        metrics = {
            "mean_reward": jnp.mean(rewards),
            "done_count": jnp.sum(game_over.astype(jnp.float32)),
        }
        return states, metrics

    def reduce_metrics(metrics):
        # explicit collectives: one pmean + one psum of [num_steps]
        # vectors per dispatch (commutes with the scan stacking, so the
        # values are bit-identical to per-step reductions)
        return {
            "mean_reward": lax.pmean(metrics["mean_reward"], axis_name),
            "done_count": lax.psum(metrics["done_count"], axis_name),
        }

    if with_params:
        def sharded(states, params):
            # params arrive replicated (P()) and hence "unvarying" under
            # shard_map's varying-manual-axes tracking; internal scans
            # (e.g. the GA3C LSTM) would then mix unvarying carries with
            # varying outputs.  Mark them varying over the env axis.
            params = jax.tree.map(
                lambda x: lax.pcast(x, (axis_name,), to="varying"), params
            )

            def scan_body(s, x):
                return body(s, params, x)

            states, metrics = lax.scan(
                scan_body, states, None, length=num_steps
            )
            return states, reduce_metrics(metrics)

        run = shard_map(
            sharded,
            mesh=mesh,
            in_specs=(P(axis_name), P()),
            out_specs=(P(axis_name), P()),
        )
        return jax.jit(run, donate_argnums=(0,))

    def sharded(states):
        def scan_body(s, x):
            return body(s, None, x)

        states, metrics = lax.scan(scan_body, states, None, length=num_steps)
        return states, reduce_metrics(metrics)

    run = shard_map(
        sharded, mesh=mesh, in_specs=P(axis_name), out_specs=(P(axis_name), P())
    )
    return jax.jit(run, donate_argnums=(0,))
