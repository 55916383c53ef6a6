"""In-graph episode auto-reset from a pre-generated scenario pool.

Replaces the reference's host-side per-episode reset (the unused
``DummyVecEnv`` reset-on-done loop, envs/vec_env.py:120-128) with a pure
in-graph select: when an env's episode is over, its whole state pytree is
swapped for a fresh state built from the next pool entry.  Scenario
generation is data-dependent rejection sampling, so pools are generated
host-side (:func:`scenarios.random_cases.scenario_pool`) and indexed with a
per-env counter on device (SURVEY.md §7.4 item 5).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gym_collision_avoidance_tpu.config import EnvConfig
from gym_collision_avoidance_tpu.core import maths
from gym_collision_avoidance_tpu.core.state import EnvState, init_state
from gym_collision_avoidance_tpu.env.step import env_step
from gym_collision_avoidance_tpu.obs import spec as obs_spec
from gym_collision_avoidance_tpu.policies import registry as policies


# Precision of the MXU pool-pick dots (see make_autoreset_step docs).
# HIGHEST is a correctness requirement, not a tuning knob: the bf16x3
# split sums back exactly against the exact one-hot, while DEFAULT
# (single-pass bf16 operands) silently rounds every selected f32 value
# ON TPU ONLY — the exact bug class of PERF.md rounds 2/4.  Exposed as a
# module constant so `bench.py --selftest-exactness` can inject the
# DEFAULT-precision fault and prove the bench's exactness check trips.
_PICK_PRECISION = jax.lax.Precision.HIGHEST


def state_from_case(cfg: EnvConfig, case, policy_id, dynamics_id=None, rng=None):
    """Jit-compatible state construction from a [A, 6] case row
    ([px, py, gx, gy, pref_speed, radius]); heading points at the goal
    (evaluate-mode semantics, envs/test_cases.py:556-562).

    A [A, 7] row additionally carries a valid flag in column 6
    (``scenarios.random_cases.scenario_pool_mixed``): invalid agents are
    parked padding whose ``is_done=~valid`` keeps them inert, letting one
    static-shape pool mix agent densities."""
    valid = case[:, 6] > 0.5 if case.shape[-1] >= 7 else None
    return init_state(
        cfg,
        pos=case[:, 0:2],
        goal=case[:, 2:4],
        radius=case[:, 5],
        pref_speed=case[:, 4],
        policy_id=policy_id,
        dynamics_id=dynamics_id,
        valid=valid,
        rng=rng,
    )


def _pack_pool(tree, acc):
    """Split a pool pytree (leaves ``[N, ...]``) for the packed reset-select.

    Returns ``(pool_flat, plan, treedef)`` where ``pool_flat`` is one
    ``[N, D]`` matrix holding every leaf that actually VARIES across pool
    entries (cast to the accumulation dtype), and ``plan`` describes, per
    leaf, how to rebuild it:

    - ``("const", row)``   — identical in every pool entry (zeros, reset
      flags, wiring ids): the fresh value is the literal ``row``, no
      contraction needed; its select fuses as pure elementwise math.
    - ``("slice", off, shape, dtype)`` — varying: read ``shape`` values at
      column ``off`` of the contracted row and cast back.

    The float round-trip is exact: f32 leaves pass through unchanged,
    int32 leaves hold values far below 2**24, bools are 0/1.
    """
    leaves, treedef = jax.tree.flatten(tree)
    # ONE bulk transfer: per-leaf np.asarray paid a full host round trip
    # per leaf (~120 leaves x ~0.4 s through the axon tunnel dominated
    # trainer construction at ~50 s, round 4)
    leaves_host = jax.device_get(leaves)
    plan = []
    cols = []
    off = 0
    for leaf, host in zip(leaves, leaves_host):
        host = np.asarray(host)
        if (
            leaf.size == 0
            or jnp.issubdtype(leaf.dtype, jnp.unsignedinteger)
            or bool(np.all(host == host[:1]))
        ):
            # uint leaves are PRNG keys (overridden by the caller with the
            # live stream); everything else here is constant across the pool.
            plan.append(("const", leaf[0]))
            continue
        flat = leaf.reshape(leaf.shape[0], -1).astype(acc)
        size = flat.shape[1]
        plan.append(("slice", off, leaf.shape[1:], leaf.dtype))
        cols.append(flat)
        off += size
    n_rows = leaves[0].shape[0] if leaves else 1
    pool_flat = (
        jnp.concatenate(cols, axis=1) if cols else jnp.zeros((n_rows, 0), acc)
    )
    return pool_flat, plan, treedef


def _unpack_row(row, plan, treedef):
    """Rebuild the pytree for one contracted ``[D]`` row (see _pack_pool)."""
    out = []
    for entry in plan:
        if entry[0] == "const":
            out.append(entry[1])
            continue
        _, off, shape, dtype = entry
        seg = jax.lax.slice(row, (off,), (off + int(np.prod(shape, dtype=np.int64)),))
        seg = seg.reshape(shape)
        if dtype == jnp.bool_:
            out.append(seg > 0.5)
        elif jnp.issubdtype(dtype, jnp.floating):
            out.append(seg.astype(dtype))
        else:
            out.append(jnp.round(seg).astype(dtype))
    return jax.tree.unflatten(treedef, out)


def make_autoreset_step(
    cfg: EnvConfig,
    pool,
    policy_id,
    active_policies: Tuple[int, ...] = (policies.NONCOOP,),
    sensors: Tuple[str, ...] = ("other_agents_states",),
    states_in_obs: Tuple[str, ...] = obs_spec.DEFAULT_STATES_IN_OBS,
    params=None,
    packed: bool = False,
    mxu_pick_min_size: int = 1,
    static_map=None,
    static_cells=None,
    return_info: bool = False,
):
    """Build a single-env step fn with reset-where-done semantics.

    Args:
        pool: [N, A, 6] scenario pool (device array).
        policy_id: [A] int32 applied to every episode.
        packed: select fresh rows through ONE ``[E, N] x [N, D]``
            contraction over a pre-flattened pool matrix instead of one
            contraction per pytree leaf.  Bit-identical (tested) but a
            measured 11% SLOWER on TPU (1.07e7 vs 1.20e7 env-steps/s,
            within-session A/B at E=8192/S=1024): the wide dot's output
            must be sliced per leaf at lane-unaligned offsets, and each
            slice costs a lane-shift layout copy, while per-leaf dots
            write every leaf in its natural layout directly.  Kept (off)
            as a recorded negative result.
        mxu_pick_min_size: flattened-row threshold above which a pool
            leaf's reset-select runs as an MXU dot instead of a masked
            sum (see ``pick``); both paths are bit-exact, the cutoff is
            purely a performance choice.  Round-4 on-chip A/B on the
            serving headline: masked sums 3.72e7, dots for rows >= 16
            6.87e7, dots for EVERYTHING (default, 1) 8.16e7 env-steps/s
            — with an N=64 contraction and Precision.HIGHEST these are
            true exact GEMMs, not the degenerate tiny-dot lowerings the
            round-2 einsum purge removed (those had contraction dims
            2-7 and default-precision bf16 operands).

    Returns:
        step(state, counter, external=None) ->
        (state', counter', obs, rewards, game_over)
        — vmap over envs for a batch (give each env a different starting
        counter, e.g. ``arange(E)``, to decorrelate scenarios).
        ``external`` is an optional [A, 2] array of external-policy actions
        (the reference's gym-loop ``step(actions)`` argument,
        envs/collision_avoidance_env.py:208-218) consumed by EXTERNAL /
        LEARNING / LEARNING_GA3C / CARRL agents; internal agents ignore it.

        With ``return_info=True`` the step returns a sixth element: the
        inner ``env_step`` info dict (including the conditionally-exact
        laserscan's ``laserscan_exactness_overflow`` guard flag) — on
        reset steps the info describes the step that ENDED the old
        episode, which is exactly the step whose exactness the guard
        certifies.  ``static_map`` / ``static_cells`` plumb through to
        ``env_step`` for laserscan/occupancy configs.
    """
    from gym_collision_avoidance_tpu.env.step import env_reset

    pool = jnp.asarray(pool)
    N = pool.shape[0]
    policy_id = jnp.asarray(policy_id, jnp.int32)
    acc = jnp.dtype(cfg.dtype)

    fast_laser = cfg.laserscan_entry_window is not None or \
        cfg.laserscan_num_candidate_discs is not None
    if (fast_laser and static_cells is not None and not return_info
            and any((s if isinstance(s, str) else s[0]) == "laserscan"
                    for s in sensors)):
        # The fast laserscan paths are conditionally exact and the
        # contract (config.py) requires every consumer to check the
        # in-graph "laserscan_exactness_overflow" guard; without
        # return_info this step would silently drop it.
        raise ValueError(
            "cfg enables a conditionally-exact laserscan fast path "
            "(laserscan_entry_window / laserscan_num_candidate_discs); "
            "build the autoreset step with return_info=True and check "
            "info['laserscan_exactness_overflow'] every step"
        )

    # Precompute every pool entry's freshly-reset state AND its first
    # observation ONCE at build time.  The previous version re-ran
    # init_state + the full reset sensor pass inside every step for every
    # env (the branchless price of reset-where-done), which made the
    # serving loop ~100x slower than the plain step.  Selecting a
    # precomputed row by one-hot contraction is a tiny [E, N] x [N, ...]
    # matmul instead.
    # jit: without it the vmapped reset dispatches eagerly op-by-op —
    # through the axon tunnel that cost ~50 s of trainer/server
    # construction (round 4); as one jitted program it is a single
    # (persistently cacheable) compile + one execution
    pool_states, pool_obs = jax.jit(
        jax.vmap(
            lambda case: env_reset(
                state_from_case(cfg, case, policy_id), cfg, sensors,
                states_in_obs, static_map, static_cells,
            )
        )
    )(pool)

    # Packed layout: a round-2 serving-loop device trace showed ~75% of
    # step time in the reset-select — each of the ~60 state/obs leaves ran
    # its own tiny [E, N] x [N, ...] dot plus a separate where-fusion, so
    # the loop was op-count-bound, not bandwidth-bound.  Packing every
    # VARYING leaf into one [N, D] matrix collapses those into a single
    # dot whose output the per-leaf selects read by slicing (fusible);
    # constant-at-reset leaves (zeros, latches, wiring) skip the
    # contraction entirely.
    pool_flat, plan, treedef = _pack_pool((pool_states, pool_obs), acc)

    def pick(onehot_f, leaf):
        """Select one [N, ...] pool row, exactly.

        Two regimes (round-4 serving trace: the per-leaf selects are the
        noncoop serving loop's biggest device cost, ~60% of the step):

        * below-threshold leaves (none by default): one-hot masked
          mul+sum — kept for A/B and as the reference semantics the
          bitwise test pins the dots against.
        * everything else (flattened row >= ``mxu_pick_min_size``,
          default: all leaves): a true ``[N] x [N, D]`` dot at
          ``Precision.HIGHEST`` — under the env vmap this batches into
          ONE ``[E, N] x [N, D]`` MXU GEMM per leaf whose output is
          written in the leaf's natural layout (unlike the packed
          wide-dot variant, whose per-leaf slices paid lane-shift
          copies).  Bit-exact structurally: every product is value*1.0
          or value*0.0 (HIGHEST's bf16x3 split of f32 sums back exactly
          against an exact 1.0), and the accumulation has a single
          nonzero term, so ordering cannot matter.  The N=64
          contraction dim is what makes these REAL GEMMs; the round-2
          "never einsum" rule targeted 2-7-wide contractions at default
          (bf16-operand) precision.

        Both regimes are exact for ints below 2^24 and bools.
        """
        def contract(vals):  # [N, ...] float -> [...]
            flat = vals.reshape((vals.shape[0], -1))
            if flat.shape[1] >= mxu_pick_min_size:
                row = jax.lax.dot_general(
                    onehot_f.astype(vals.dtype)[None, :], flat,
                    (((1,), (0,)), ((), ())),
                    precision=_PICK_PRECISION,
                )[0]
                return row.reshape(vals.shape[1:])
            oh = onehot_f.astype(vals.dtype).reshape((vals.shape[0],) + (1,) * (vals.ndim - 1))
            return jnp.sum(oh * vals, axis=0)

        if leaf.dtype == jnp.bool_:
            return contract(leaf.astype(acc)) > 0.5
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return contract(leaf)
        if jnp.issubdtype(leaf.dtype, jnp.signedinteger):
            return jnp.round(contract(leaf.astype(acc))).astype(leaf.dtype)
        # uint PRNG keys don't survive a float contraction; the rng is
        # overridden with the live stream below, so any row works.
        return leaf[0]

    def step(state: EnvState, counter, external=None):
        state, obs, rewards, game_over, info = env_step(
            state, external, cfg, params, active_policies, sensors,
            states_in_obs, static_map, static_cells,
        )

        # Standard autoreset contract (cf. DummyVecEnv reset-on-done,
        # envs/vec_env.py:120-128): on reset steps the returned obs is the
        # NEW episode's first observation, matching the returned state.
        onehot_f = (jnp.arange(N) == counter % N).astype(acc)
        if packed:
            # masked sum, not a dot: exact f32 (bf16 dot operands would
            # round the selected values)
            fresh_row = jnp.sum(onehot_f[:, None] * pool_flat, axis=0)
            fresh, fresh_obs = _unpack_row(fresh_row, plan, treedef)
        else:
            fresh = jax.tree.map(lambda leaf: pick(onehot_f, leaf), pool_states)
            fresh_obs = jax.tree.map(lambda leaf: pick(onehot_f, leaf), pool_obs)
        fresh = fresh.replace(rng=state.rng)

        def sel(new, old):
            return jnp.where(jnp.reshape(game_over, (1,) * old.ndim), new, old)

        next_state = jax.tree.map(sel, fresh, state)
        obs = jax.tree.map(sel, fresh_obs, obs)
        counter = counter + game_over.astype(jnp.int32)
        if return_info:
            return next_state, counter, obs, rewards, game_over, info
        return next_state, counter, obs, rewards, game_over

    return step
