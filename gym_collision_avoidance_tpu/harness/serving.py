"""Production serving loop: continuous batched episodes at device rate.

The highest-throughput way to consume this engine (the pattern behind
every PERF.md serving number, packaged as API):

* **in-graph autoreset** — episodes reset from a scenario pool inside
  the jitted scan, so every step of every env advances a live episode
  (replaces the reference's reset-on-done host loop,
  ``envs/vec_env.py:124-125``);
* **long dispatches** — ``steps_per_dispatch`` env steps per XLA
  program launch amortize the per-dispatch host overhead;
* **dispatch pipelining** — ``dispatch()`` never blocks the host: JAX
  async dispatch chains programs back-to-back, hiding the host/launch
  overhead behind device compute entirely (measured +10-260% vs
  blocking per dispatch on the tunnel-attached chip; PERF.md round 4).

Example::

    server = AutoresetServer(cfg, pool, policy_id, num_envs=8192)
    for _ in range(100):
        out = server.dispatch()        # returns device futures, no sync
        consume(out)                   # sync only when values are read
    print(server.episodes_completed()) # syncs

``dispatch`` returns per-dispatch stacked outputs ``[S, ...]`` for the
requested ``collect`` keys; with ``collect=()`` only the final metrics
survive and XLA dead-code-eliminates everything unconsumed except the
sensor pipeline (kept live via the obs checksum, same honesty rule as
``bench.py``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gym_collision_avoidance_tpu.config import EnvConfig
from gym_collision_avoidance_tpu.env import autoreset
from gym_collision_avoidance_tpu.obs import spec as obs_spec


class AutoresetServer:
    """Continuous steady-state serving of batched episodes.

    Args:
        cfg: env config (static).
        pool: [N, A, 6] scenario pool (rows as in
            ``scenarios.random_cases.scenario_pool``).
        policy_id: [A] int32 policy ids applied to every episode.
        num_envs: batch width E.
        steps_per_dispatch: env steps per XLA launch (S).
        collect: obs keys returned stacked per dispatch (e.g.
            ``("other_agents_states",)``); empty tuple = throughput mode
            (only scalar metrics survive).
        static_map / static_cells: map inputs for laserscan /
            occupancy-grid configs (as in ``env.step.env_step``).  When
            the config enables a conditionally-exact laserscan fast path,
            its in-graph guard is accumulated across every step and
            surfaced both per-dispatch (``out["exactness_overflow"]``)
            and cumulatively (:meth:`exactness_overflow`).
        active_policies / params / sensors / states_in_obs: as in
            :func:`env.autoreset.make_autoreset_step`.
        mesh: optional :class:`jax.sharding.Mesh` with an ``env`` axis
            (e.g. ``parallel.distributed.global_mesh()``).  The env
            batch is sharded ``P("env")`` across every device; the step
            is embarrassingly parallel, so the only collectives XLA
            inserts are the scalar metric reductions (mean reward / obs
            checksum / guard any-reduce) — the SPMD treatment SURVEY.md
            §2.3 obligation 2 demands for the serving workload itself.
            Sharded and unsharded servers produce bit-identical states
            and episode counters (tests/test_parallel.py).
            ``num_envs`` must divide the mesh device count.
    """

    def __init__(
        self,
        cfg: EnvConfig,
        pool,
        policy_id,
        num_envs: int = 4096,
        steps_per_dispatch: int = 256,
        collect: Tuple[str, ...] = (),
        active_policies: Optional[Tuple[int, ...]] = None,
        params=None,
        sensors: Sequence[str] = ("other_agents_states",),
        states_in_obs: Sequence[str] = obs_spec.DEFAULT_STATES_IN_OBS,
        static_map=None,
        static_cells=None,
        mesh=None,
    ):
        pool = jnp.asarray(pool, jnp.dtype(cfg.dtype))
        policy_id = np.asarray(policy_id, np.int32)
        if active_policies is None:
            active_policies = tuple(sorted({int(p) for p in policy_id}))
        astep = autoreset.make_autoreset_step(
            cfg, pool, jnp.asarray(policy_id), active_policies,
            tuple(sensors), tuple(states_in_obs), params,
            static_map=static_map, static_cells=static_cells,
            return_info=True,
        )
        self.num_envs = int(num_envs)
        self.steps_per_dispatch = int(steps_per_dispatch)
        N = pool.shape[0]

        def body(carry, _):
            st, c = carry
            st, c, obs, rew, go, info = jax.vmap(astep)(st, c)
            out = {k: obs[k] for k in collect}
            # Per-step metrics leave the scan UNREDUCED over the env axis
            # ([E] rows, still sharded); the cross-env reduction happens
            # once on the stacked [S, E] arrays after the scan.  Same
            # values (the reduction commutes with stacking); on a device
            # mesh this is 2 collectives per DISPATCH instead of 2 per
            # step — the round-3 make_distributed_rollout lesson
            # (SCALING.md), applied to the serving loop.
            out["_rew_env"] = jnp.sum(rew, axis=-1)          # [E]
            out["_obs_env"] = jnp.sum(obs["dist_to_goal"], axis=-1)
            if "laserscan_exactness_overflow" in info:
                out["_ovf_env"] = info["laserscan_exactness_overflow"]
            return (st, c), out

        n_agents = int(np.asarray(policy_id).shape[0])

        @jax.jit
        def run(carry):
            (st, c), out = jax.lax.scan(
                lambda sc_, _: body(sc_, _), (carry[0], carry[1]), None,
                length=self.steps_per_dispatch,
            )
            # post-scan cross-env reductions (one collective each under a
            # mesh); keep the sensor pipeline live even in throughput mode
            out["mean_reward"] = jnp.mean(out.pop("_rew_env"), axis=1) / n_agents
            out["obs_checksum"] = jnp.sum(out.pop("_obs_env"), axis=1)
            ovf = carry[2]
            if "_ovf_env" in out:
                step_ovf = jnp.any(out.pop("_ovf_env"), axis=1)  # [S]
                out["exactness_overflow"] = step_ovf
                ovf = ovf | jnp.any(step_ovf)
            return (st, c, ovf), out

        self._run = run
        # jit: one program instead of eager per-op dispatch at startup
        states = jax.jit(
            jax.vmap(
                lambda i: autoreset.state_from_case(
                    cfg, pool[i % N], jnp.asarray(policy_id)
                )
            )
        )(jnp.arange(self.num_envs))
        counters = jnp.arange(self.num_envs, dtype=jnp.int32)
        ovf0 = jnp.asarray(False)
        if mesh is not None:
            # Shard the env axis of every carry leaf across the mesh;
            # jit propagates the shardings through the (embarrassingly
            # parallel) scan, so each device steps only its env shard.
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = mesh.devices.size
            if self.num_envs % n_dev:
                raise ValueError(
                    f"num_envs={self.num_envs} must divide the "
                    f"{n_dev}-device mesh"
                )
            env_sh = NamedSharding(mesh, P("env"))
            rep_sh = NamedSharding(mesh, P())
            states = jax.tree.map(
                lambda x: jax.device_put(x, env_sh), states
            )
            counters = jax.device_put(counters, env_sh)
            ovf0 = jax.device_put(ovf0, rep_sh)
        self._carry = (states, counters, ovf0)

    def dispatch(self):
        """Enqueue one S-step dispatch; returns the stacked outputs as
        device futures WITHOUT blocking the host (read them to sync)."""
        self._carry, out = self._run(self._carry)
        return out

    def states(self):
        """Current (sharded/batched) env states, synced."""
        jax.block_until_ready(self._carry[0])
        return self._carry[0]

    def episodes_completed(self) -> int:
        """Total episodes finished since construction (syncs).

        Summed in int64 on host: a long-lived server can exceed 2**31
        total episodes across envs long before any single env's int32
        counter wraps.
        """
        counters = np.asarray(self._carry[1], np.int64)
        return int(np.sum(counters - np.arange(self.num_envs, dtype=np.int64)))

    def exactness_overflow(self) -> bool:
        """True if any step since construction tripped the laserscan
        exactness guard (always False for configs without the
        conditionally-exact fast paths; syncs)."""
        return bool(self._carry[2])

    def throughput(self, reps: int = 3, pipeline: int = 8):
        """Measured steady-state env-steps/s (median of ``reps``, each
        timing ``pipeline`` chained dispatches)."""
        import time

        out = self.dispatch()           # warmup beyond compile
        jax.block_until_ready(out["mean_reward"])
        rates = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _p in range(pipeline):
                out = self.dispatch()
            jax.block_until_ready(out["mean_reward"])
            rates.append(
                pipeline * self.num_envs * self.steps_per_dispatch
                / (time.perf_counter() - t0)
            )
        rates.sort()
        return rates[len(rates) // 2]
