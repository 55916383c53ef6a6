"""Batched sensors.

``other_agents_states`` replicates the reference's
``OtherAgentsStatesSensor.sense`` + ``get_clipped_sorted_inds``
(``/root/reference/gym_collision_avoidance/envs/sensors/OtherAgentsStatesSensor.py:20-144``)
exactly — including the ``round(dist, 2)`` quantization and lateral-position
tie-break that determine the sort order — but as one O(A^2) masked batch of
vector ops instead of per-agent Python loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gym_collision_avoidance_tpu import config as cfg_mod
from gym_collision_avoidance_tpu.core import maths

_INF = jnp.inf


def other_agents_states(state, cfg):
    """Sense the K closest other agents for every host agent.

    Args:
        state: :class:`EnvState` for one env (leaves [A, ...]).
        cfg:   :class:`EnvConfig` (static).

    Returns:
        (sensor_out [A, K, 7], closest [A, 7], counts [A] int32) where the
        7-tuple is [p_parallel_ego, p_orthog_ego, v_parallel_ego,
        v_orthog_ego, other_radius, combined_radius, dist_2_other]
        (OtherAgentsStatesSensor.py:128-134), ``closest`` is the
        ``host_agent.other_agent_states`` cache (``:136-137``, falls back to
        the previous value when no other agent is visible), and ``counts``
        is ``num_other_agents_observed`` (``:142``).
    """
    A = state.pos.shape[0]
    K = cfg.max_num_other_agents_observed
    dtype = state.pos.dtype

    # [A_host, A_other, 2] relative positions.
    rel = state.pos[None, :, :] - state.pos[:, None, :]
    dist_centers = maths.norm2(rel)                                   # [A, A]
    p_par = jnp.einsum("hoc,hc->ho", rel, state.ref_prll)
    p_orth = jnp.einsum("hoc,hc->ho", rel, state.ref_orth)
    v_par = jnp.einsum("oc,hc->ho", state.vel, state.ref_prll)
    v_orth = jnp.einsum("oc,hc->ho", state.vel, state.ref_orth)
    other_r = jnp.broadcast_to(state.radius[None, :], (A, A))
    combined_r = state.radius[:, None] + state.radius[None, :]
    d2other = dist_centers - combined_r                               # [A, A]

    eye = jnp.eye(A, dtype=bool)
    # Agents beyond the sensing horizon are dropped entirely
    # (OtherAgentsStatesSensor.py:90-92); `>` is strict in the reference.
    visible = (~eye) & state.valid[None, :] & (dist_centers <= cfg.sensing_horizon)

    # Sort keys (OtherAgentsStatesSensor.py:103): [round(d,2), p_orth, tti].
    d_rounded = jnp.round(d2other * 100.0) / 100.0

    method = cfg.agent_sorting_method
    if method == cfg_mod.SORT_TIME_TO_IMPACT:
        tti = maths.compute_time_to_impact(
            state.pos[:, None, :],
            state.pos[None, :, :],
            state.vel[:, None, :],
            state.vel[None, :, :],
            combined_r,
        )
        # sorted by (-tti, -d, p_orth) ascending (":38").
        k_primary = jnp.where(visible, -tti, _INF)
        k_secondary = jnp.where(visible, -d_rounded, _INF)
        k_tertiary = jnp.where(visible, p_orth, _INF)
    else:
        # closest_first / closest_last both clip by (d, p_orth) ascending
        # (":33-39").
        k_primary = jnp.where(visible, d_rounded, _INF)
        k_secondary = jnp.where(visible, p_orth, _INF)
        k_tertiary = None

    # Stable lexicographic argsort; ties beyond the keys fall back to index
    # order, matching Python's stable `sorted`.
    # Pad the candidate axis up to K so that rows are always [A, K, 7] even
    # when A-1 < K (the reference pads its output to
    # MAX_NUM_OTHER_AGENTS_OBSERVED with zeros, ":108").
    if A < K + 1:
        pad = K + 1 - A

        def _padj(x, fill):
            return jnp.pad(x, ((0, 0), (0, pad)), constant_values=fill)

        visible = _padj(visible, False)
        k_primary = _padj(k_primary, _INF)
        k_secondary = _padj(k_secondary, _INF)
        if k_tertiary is not None:
            k_tertiary = _padj(k_tertiary, _INF)
        p_par = _padj(p_par, 0.0)
        p_orth = _padj(p_orth, 0.0)
        v_par = _padj(v_par, 0.0)
        v_orth = _padj(v_orth, 0.0)
        other_r = _padj(other_r, 0.0)
        combined_r = _padj(combined_r, 0.0)
        d2other = _padj(d2other, 0.0)
        d_rounded = _padj(d_rounded, 0.0)

    if k_tertiary is None:
        order = jnp.lexsort((k_secondary, k_primary), axis=-1)        # [A, A']
    else:
        order = jnp.lexsort((k_tertiary, k_secondary, k_primary), axis=-1)
    order_k = order[:, :K]                                            # [A, K]

    take = lambda x: jnp.take_along_axis(x, order_k, axis=1)
    sel_visible = take(visible)                                       # [A, K]

    # Re-sort the clipped K by the final ordering scheme (":41-50").
    if method == cfg_mod.SORT_CLOSEST_LAST:
        f_primary = jnp.where(sel_visible, -take(d_rounded), _INF)
        f_secondary = jnp.where(sel_visible, take(p_orth), _INF)
        reorder = jnp.lexsort((f_secondary, f_primary), axis=-1)      # [A, K]
        order_k = jnp.take_along_axis(order_k, reorder, axis=1)
        sel_visible = take(visible)
    # closest_first and time_to_impact re-sort by the same key as the clip
    # sort, which is a no-op on an already-sorted stable list.

    rows = jnp.stack(
        [
            take(p_par),
            take(p_orth),
            take(v_par),
            take(v_orth),
            take(other_r),
            take(combined_r),
            take(d2other),
        ],
        axis=-1,
    ).astype(dtype)                                                   # [A, K, 7]
    rows = jnp.where(sel_visible[..., None], rows, 0.0)

    counts = jnp.minimum(jnp.sum(visible, axis=1), K).astype(jnp.int32)

    # host_agent.other_agent_states keeps its previous value if nothing is
    # visible (the reference only assigns it for other_agent_count == 0 in
    # the loop, ":136-137").
    closest = jnp.where((counts > 0)[:, None], rows[:, 0, :], state.other_agent_states)

    return rows, closest, counts
