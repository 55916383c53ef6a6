"""Batched ORCA (reciprocal velocity obstacles) in pure JAX.

TPU-native replacement for the C++ RVO2 library the reference drives
through Cython (``envs/policies/RVOPolicy.py:25-96``; built from source in
install.sh:26-33).  Implements the ORCA velocity computation of van den
Berg et al. (ISRR 2009) — half-plane construction per neighbor + the
incremental 2-D linear program with the densest-case LP3 fallback — as
fixed-shape masked ops:

* neighbor "k-d tree" -> masked all-pairs sort by distance (A <= ~40, so
  O(A^2) beats a tree on TPU),
* LP2's sequential constraint insertion -> ``lax.fori_loop`` with a
  first-failure latch,
* LP1 -> one vectorized pass over the prefix constraints (tLeft/tRight are
  monotone, so the loop collapses to masked min/max reductions),
* LP3 -> masked outer loop, entered only when some agent's LP2 failed.

The per-agent ``collab_coeff`` reproduces the mit-acl fork's collaboration
coefficient (0.5 = classic reciprocity; 0 = egoistic): it scales the
half-plane offset ``u``.  Matches native/orca.cpp (the C++ oracle) to
~1e-12 in float64.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

EPS = 1e-5  # RVO_EPSILON

# Statically unroll the LP1/LP2/LP3 constraint-insertion loops when the
# line count is at most this (round 5): a rolled ``fori_loop`` at NL=3
# pays while-loop re-entry per iteration and traces every ``_lp1`` with a
# DYNAMIC prefix mask (``arange(NL) < k``), while the unrolled form makes
# k a compile-time constant — the k=0 pass has an empty prefix and XLA
# dead-code-eliminates the whole triangle above the diagonal.  The
# op-by-op math is identical (same order, same masks), so trajectories
# are bit-identical (A/B-verified on-chip, scripts/ab_orca_r5.py).  Kept
# rolled above the threshold: at A=40 the LP3 nest would unroll to
# ~NL^2 = 1500 _lp1 bodies and blow up compile time.
UNROLL_MAX_NL = 8

# Run the (unrolled) LPs on the NATURAL-order line set with rank-prefix
# masks instead of permuting lines into rank order first (round 5): the
# post-unroll orca4 trace had the one-hot permute as the top op (~8% of
# the step).  Bit-identical — the prefix reductions are min/max/any
# (order-independent) and the pivot select has one nonzero term — but a
# measured NEGATIVE, default OFF: 2.79e7 vs 3.87e7 at E=16384/S=128
# (scripts/ab_orca_r5.py --natural).  The ~24 per-pivot one-row masked
# selects (every _lp1/_lp2/_lp3 body, including the LP3-nested LP2s)
# cost more than the single up-front permute they replace, which
# amortizes over the whole LP chain.  Kept as a validated variant.
NATURAL_LP = False


def _det(ax, ay, bx, by):
    return ax * by - ay * bx


def _sel_row(arr, selv):
    """Select the (at most one) row of ``arr`` where ``selv`` is True, by
    one-term masked sum — exact (adding zeros is exact for finite values;
    callers zero any non-finite rows first)."""
    return jnp.sum(jnp.where(selv[:, None], arr, 0.0), axis=0)


def _lp1(pt, dr, lvalid, k, radius, opt_vel, direction_opt, rank=None):
    """Solve on line k subject to lines j < k and the disc (linearProgram1).

    With ``rank=None`` the constraint arrays are ALREADY in insertion
    (distance-rank) order and k indexes rows directly.  With ``rank``
    given ([NA] int, a permutation), the arrays stay in NATURAL row
    order and k is a POSITION in rank order: the pivot line is the row
    with rank == k and the prefix is ``rank < k`` — all reductions
    (min/max/any) are order-independent, so results are bit-identical
    to the permuted form while skipping the one-hot permute of the
    whole constraint set (the orca4 trace's top op after the round-5
    unroll, ~8% of the step).

    Returns (fail, result[2]).
    """
    NL = pt.shape[0]
    if rank is None:
        p_k = pt[k]
        d_k = dr[k]
        mask = (jnp.arange(NL) < k) & lvalid
    else:
        selv = rank == k
        p_k = _sel_row(pt, selv)
        d_k = _sel_row(dr, selv)
        mask = (rank < k) & lvalid
    dot_p = jnp.dot(p_k, d_k)
    disc = dot_p * dot_p + radius * radius - jnp.dot(p_k, p_k)
    fail0 = disc < 0.0
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_left0 = -dot_p - sq
    t_right0 = -dot_p + sq
    denom = _det(d_k[0], d_k[1], dr[:, 0], dr[:, 1])
    numer = _det(dr[:, 0], dr[:, 1], p_k[0] - pt[:, 0], p_k[1] - pt[:, 1])
    small = jnp.abs(denom) <= EPS
    fail1 = jnp.any(mask & small & (numer < 0.0))
    t = numer / jnp.where(small, 1.0, denom)
    t_right = jnp.min(
        jnp.where(mask & ~small & (denom >= 0.0), t, jnp.inf)
    )
    t_left = jnp.max(
        jnp.where(mask & ~small & (denom < 0.0), t, -jnp.inf)
    )
    t_left = jnp.maximum(t_left0, t_left)
    t_right = jnp.minimum(t_right0, t_right)
    fail = fail0 | fail1 | (t_left > t_right)

    if direction_opt:
        t_sel = jnp.where(jnp.dot(opt_vel, d_k) > 0.0, t_right, t_left)
    else:
        t_sel = jnp.clip(jnp.dot(d_k, opt_vel - p_k), t_left, t_right)
    return fail, p_k + t_sel * d_k


def _lp2(pt, dr, lvalid, radius, opt_vel, direction_opt, rank=None,
         num_lines=None):
    """Sequential constraint insertion (linearProgram2).

    ``rank`` as in :func:`_lp1` (natural-order arrays, rank-order
    insertion); ``num_lines`` is the insertion count when it differs
    from the array length (natural arrays carry the self row, which
    never holds a rank < NL).

    Returns (result[2], fail_idx) with fail_idx == num_lines on success.
    """
    NL = pt.shape[0] if num_lines is None else num_lines
    if direction_opt:
        res0 = radius * opt_vel
    else:
        speed_sq = jnp.dot(opt_vel, opt_vel)
        res0 = jnp.where(
            speed_sq > radius * radius,
            radius * opt_vel / jnp.sqrt(jnp.maximum(speed_sq, 1e-300)),
            opt_vel,
        )

    def body(k, carry):
        result, fail_idx = carry
        if rank is None:
            p_k = pt[k]
            d_k = dr[k]
            lvalid_k = lvalid[k]
        else:
            selv = rank == k
            p_k = _sel_row(pt, selv)
            d_k = _sel_row(dr, selv)
            lvalid_k = jnp.any(selv & lvalid)
        violated = _det(d_k[0], d_k[1], p_k[0] - result[0], p_k[1] - result[1]) > 0.0
        active = lvalid_k & (fail_idx == NL) & violated
        fail, res = _lp1(pt, dr, lvalid, k, radius, opt_vel, direction_opt,
                         rank=rank)
        result = jnp.where(active & ~fail, res, result)
        fail_idx = jnp.where(active & fail, k, fail_idx)
        return result, fail_idx

    carry = (res0, jnp.asarray(NL))
    if NL <= UNROLL_MAX_NL:
        # static unroll: identical op sequence, k a compile-time constant
        for k in range(NL):
            carry = body(k, carry)
        return carry
    return jax.lax.fori_loop(0, NL, body, carry)


def _lp3(pt, dr, lvalid, begin_line, radius, result, rank=None,
         num_lines=None):
    """Densest-case fallback (linearProgram3): minimize max violation.

    ``rank`` / ``num_lines`` as in :func:`_lp2`: with ``rank`` the
    constraint arrays stay in natural row order and the loop index i is
    a rank-order position (``begin_line`` is already a rank).
    """
    NL = pt.shape[0] if num_lines is None else num_lines

    def body(i, carry):
        result, distance = carry
        if rank is None:
            p_i = pt[i]
            d_i = dr[i]
            lvalid_i = lvalid[i]
            prefix = jnp.arange(NL) < i
        else:
            selv = rank == i
            p_i = _sel_row(pt, selv)
            d_i = _sel_row(dr, selv)
            lvalid_i = jnp.any(selv & lvalid)
            prefix = rank < i
        viol = _det(d_i[0], d_i[1], p_i[0] - result[0], p_i[1] - result[1])
        active = lvalid_i & (i >= begin_line) & (viol > distance)

        # Projected constraints of lines j < i onto line i.
        denom = _det(d_i[0], d_i[1], dr[:, 0], dr[:, 1])
        small = jnp.abs(denom) <= EPS
        same_dir = small & (jnp.sum(d_i * dr, axis=1) > 0.0)
        mid = 0.5 * (p_i + pt)
        tproj = _det(dr[:, 0], dr[:, 1], p_i[0] - pt[:, 0], p_i[1] - pt[:, 1]) / jnp.where(
            small, 1.0, denom
        )
        cross_pt = p_i + tproj[:, None] * d_i
        proj_pt = jnp.where(small[:, None], mid, cross_pt)
        dd = dr - d_i
        dd_norm = jnp.sqrt(jnp.maximum(jnp.sum(dd * dd, axis=1), 1e-300))
        proj_dr = dd / dd_norm[:, None]
        pvalid = prefix & lvalid & ~same_dir

        opt = jnp.stack([-d_i[1], d_i[0]])
        res2, fail2 = _lp2(proj_pt, proj_dr, pvalid, radius, opt, True,
                           rank=rank, num_lines=num_lines)
        ok = fail2 == NL
        new_result = jnp.where(active & ok, res2, result)
        new_distance = jnp.where(
            active,
            _det(d_i[0], d_i[1], p_i[0] - new_result[0], p_i[1] - new_result[1]),
            distance,
        )
        return new_result, new_distance

    carry = (result, jnp.asarray(0.0, result.dtype))
    if NL <= UNROLL_MAX_NL:
        for i in range(NL):
            carry = body(i, carry)
        return carry[0]
    result, _ = jax.lax.fori_loop(0, NL, body, carry)
    return result


def _orca_lines_one(rel_pos, rel_vel, comb_r, vel_i, collab_i,
                    dt, time_horizon):
    """ORCA half-planes of one agent vs a set of neighbors, given the
    already-formed relative quantities (no gathers — a round-4 trace had
    the per-neighbor ``pos[j]``-style gathers at ~80% of the orca4
    serving step; the caller now builds lines in natural j space and
    permutes afterwards)."""
    dist_sq = jnp.sum(rel_pos * rel_pos, axis=1)
    comb_r_sq = comb_r * comb_r

    inv_th = 1.0 / time_horizon
    inv_dt = 1.0 / dt

    # --- no-collision branch ---
    w = rel_vel - inv_th * rel_pos
    w_len_sq = jnp.sum(w * w, axis=1)
    dot1 = jnp.sum(w * rel_pos, axis=1)
    on_cutoff = (dot1 < 0.0) & (dot1 * dot1 > comb_r_sq * w_len_sq)

    w_len = jnp.sqrt(jnp.maximum(w_len_sq, 1e-300))
    unit_w = w / w_len[:, None]
    dir_cut = jnp.stack([unit_w[:, 1], -unit_w[:, 0]], axis=1)
    u_cut = (comb_r * inv_th - w_len)[:, None] * unit_w

    leg = jnp.sqrt(jnp.maximum(dist_sq - comb_r_sq, 0.0))
    left = _det(rel_pos[:, 0], rel_pos[:, 1], w[:, 0], w[:, 1]) > 0.0
    safe_dist_sq = jnp.maximum(dist_sq, 1e-300)
    dir_left = jnp.stack(
        [rel_pos[:, 0] * leg - rel_pos[:, 1] * comb_r,
         rel_pos[:, 0] * comb_r + rel_pos[:, 1] * leg], axis=1
    ) / safe_dist_sq[:, None]
    dir_right = -jnp.stack(
        [rel_pos[:, 0] * leg + rel_pos[:, 1] * comb_r,
         -rel_pos[:, 0] * comb_r + rel_pos[:, 1] * leg], axis=1
    ) / safe_dist_sq[:, None]
    dir_leg = jnp.where(left[:, None], dir_left, dir_right)
    dot2 = jnp.sum(rel_vel * dir_leg, axis=1)
    u_leg = dot2[:, None] * dir_leg - rel_vel

    dir_nc = jnp.where(on_cutoff[:, None], dir_cut, dir_leg)
    u_nc = jnp.where(on_cutoff[:, None], u_cut, u_leg)

    # --- collision branch (cut-off at one time step) ---
    w_c = rel_vel - inv_dt * rel_pos
    w_c_len = jnp.sqrt(jnp.maximum(jnp.sum(w_c * w_c, axis=1), 1e-300))
    unit_w_c = w_c / w_c_len[:, None]
    dir_col = jnp.stack([unit_w_c[:, 1], -unit_w_c[:, 0]], axis=1)
    u_col = (comb_r * inv_dt - w_c_len)[:, None] * unit_w_c

    colliding = dist_sq <= comb_r_sq
    direction = jnp.where(colliding[:, None], dir_col, dir_nc)
    u = jnp.where(colliding[:, None], u_col, u_nc)

    point = vel_i + collab_i * u
    return point, direction


@functools.partial(jax.jit, static_argnames=("max_neighbors",))
def orca_velocities(pos, vel, pref_vel, radius, max_speed, collab_coeff,
                    valid, dt, neighbor_dist, time_horizon,
                    max_neighbors=None):
    """ORCA velocities for all agents from one world snapshot.

    Args:
        pos, vel, pref_vel: [A, 2]; radius, max_speed, collab_coeff,
        valid: [A].  dt/neighbor_dist/time_horizon: scalars.
        max_neighbors: static cap on neighbors (None -> A-1).

    Returns:
        new_vel [A, 2]; rows of invalid agents are zero.
    """
    A = pos.shape[0]
    NL = A - 1
    if max_neighbors is None:
        max_neighbors = NL
    dtype = pos.dtype

    if NL == 0:
        # Single agent: no constraints, LP2 degenerates to the disc clip.
        speed_sq = jnp.sum(pref_vel * pref_vel, axis=1)
        scale = jnp.where(
            speed_sq > max_speed**2,
            max_speed / jnp.sqrt(jnp.maximum(speed_sq, 1e-300)),
            1.0,
        )
        return jnp.where(valid[:, None], pref_vel * scale[:, None], 0.0).astype(dtype)

    def one(i):
        rel = pos - pos[i]
        dist_sq = jnp.sum(rel * rel, axis=1)
        cand = (jnp.arange(A) != i) & valid & (
            dist_sq < neighbor_dist * neighbor_dist
        )
        key = jnp.where(cand, dist_sq, jnp.inf)
        # Ascending-distance ordering WITHOUT sort or gather primitives
        # (both scalarize on TPU; a round-4 trace had this agent's
        # argsort at 23% and the downstream pos[j]/vel[j]/cand[order]
        # gathers at ~80% of the orca4 serving step).  Stable pairwise
        # rank (ties broken by index — exactly argsort's stable order);
        # lines are built in NATURAL j space from the already-formed
        # relative quantities, then permuted into rank order by one-hot
        # masked sums.  Ranks are a permutation of [0, A), so slot r
        # receives exactly the values the gathered formulation produced
        # — bit-identical, including the masked rows (dropping rank A-1
        # reproduces argsort(key)[:NL]: the max (key, idx) sorts last).
        idx = jnp.arange(A)
        lt = key[:, None] < key[None, :]
        eq_tie = (key[:, None] == key[None, :]) & (idx[:, None] < idx[None, :])
        rank = jnp.sum(lt | eq_tie, axis=0)              # [A] rank of each j
        slot = jnp.arange(NL)

        pt_n, dr_n = _orca_lines_one(
            rel, vel[i] - vel, radius[i] + radius, vel[i], collab_coeff[i],
            dt, time_horizon,
        )                                                # [A, 2] natural order
        # The self row is degenerate (rel = 0): in float32 its guarded
        # divisions underflow to 0/0 = NaN, and a NaN row would poison
        # every slot through the 0*NaN products of the masked sums (the
        # gathered formulation never evaluated it — self ranks last and
        # was dropped).  Replace it by select, which kills NaN.
        self_row = (idx == i)[:, None]
        pt_n = jnp.where(self_row, 0.0, pt_n)
        dr_n = jnp.where(self_row, 0.0, dr_n)

        if use_natural:
            # Natural-space LP (round 5): skip the one-hot permute of the
            # whole line set — the LPs run on the natural rows with
            # rank-prefix masks (``rank < k``) and one-row pivot selects.
            # All reductions are order-independent, so this is
            # bit-identical to the permuted form (A/B-verified on the
            # serving loop, scripts/ab_orca_r5.py --natural).
            lvalid_nat = cand & (rank < min(NL, max_neighbors))
            result, fail_idx = _lp2(
                pt_n, dr_n, lvalid_nat, max_speed[i], pref_vel[i], False,
                rank=rank, num_lines=NL,
            )
            needs_lp3 = fail_idx < NL
            return pt_n, dr_n, lvalid_nat, rank, result, fail_idx, needs_lp3

        onehot = rank[None, :] == slot[:, None]          # [NL, A]
        ohf = onehot.astype(dtype)
        pt = jnp.sum(ohf[:, :, None] * pt_n[None, :, :], axis=1)
        dr = jnp.sum(ohf[:, :, None] * dr_n[None, :, :], axis=1)
        lvalid = jnp.any(onehot & cand[None, :], axis=1) & (
            jnp.arange(NL) < max_neighbors
        )
        result, fail_idx = _lp2(pt, dr, lvalid, max_speed[i], pref_vel[i], False)
        needs_lp3 = fail_idx < NL
        return pt, dr, lvalid, rank, result, fail_idx, needs_lp3

    use_natural = NL <= UNROLL_MAX_NL and NATURAL_LP
    pt, dr, lvalid, rankv, result, fail_idx, needs_lp3 = jax.vmap(one)(
        jnp.arange(A)
    )

    # LP3 is rare (dense crowds); skip the whole pass when nobody failed.
    def run_lp3(args):
        pt, dr, lvalid, rankv, result, fail_idx = args
        return jax.vmap(
            lambda p, d, lv, rk, bl, r, res: jnp.where(
                bl < NL,
                _lp3(p, d, lv, bl, r, res,
                     rank=rk if use_natural else None,
                     num_lines=NL if use_natural else None),
                res,
            )
        )(pt, dr, lvalid, rankv, fail_idx, max_speed, result)

    result = jax.lax.cond(
        jnp.any(needs_lp3),
        run_lp3,
        lambda args: args[4],
        (pt, dr, lvalid, rankv, result, fail_idx),
    )
    return jnp.where(valid[:, None], result, jnp.zeros_like(result)).astype(dtype)
