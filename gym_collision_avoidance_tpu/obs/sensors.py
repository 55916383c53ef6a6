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
import numpy as np

from gym_collision_avoidance_tpu import config as cfg_mod
from gym_collision_avoidance_tpu.core import maths
from gym_collision_avoidance_tpu.maps import grid as map_grid

_INF = jnp.inf

# Agent-count threshold above which the sensor's one-hot row-select
# runs as a batched MXU dot instead of masked mul+sums.  DISABLED by
# default: unlike the autoreset MXU pool pick (same exactness argument,
# +2.2x on the headline), this dot's 7-wide output minor starves the
# MXU — measured on-chip at A=40 it is 10% SLOWER than the masked sums
# (218k -> 197k env-steps/s) and 2.5% slower at A=20.  Kept as a
# recorded negative with its bitwise A/B test (test_sensor.py); the
# rule refines to: MXU needs BOTH a wide contraction AND a non-trivial
# output row.
SENSOR_MXU_MIN_A = 1 << 30

# Round-5 A/B flag (scripts/ab_sensor_r5.py): fold the 7 per-field
# one-hot masked sums + output concatenate into ONE broadcast reduce
# whose output is [A, K, 7] directly (input-side field stack).
# Bit-identical; see the variant comment in other_agents_states.
_SELECT_STACK_IN = False

# Round-5 A/B flag (scripts/ab_laser_r5.py): run the windowed/beam-
# compacted laserscan block as a fused Pallas VMEM kernel
# (ops/laser_pallas.py) instead of the XLA staged form — kills the
# packed-field materialization (17% of the r4 roofline).  f32 only.
_WBC_PALLAS = False

# LaserScan geometry (hard-coded in the reference,
# envs/sensors/LaserScanSensor.py:32-39).
LASER_RANGE_RESOLUTION = 0.1
LASER_MAX_RANGE = 6.0
LASER_MIN_ANGLE = -jnp.pi / 2
LASER_MAX_ANGLE = jnp.pi / 2
# Number of range samples: len(np.arange(0, max_range, resolution)).
LASER_NUM_RANGE_SAMPLES = len(
    np.arange(0.0, LASER_MAX_RANGE, LASER_RANGE_RESOLUTION)
)


def _range_samples(dtype):
    """The range-sample table, computed as ``k * resolution`` in ``dtype``.

    In float64 this is bitwise-identical to the reference's
    ``np.arange(0, 6, 0.1)`` (numpy fills arange as ``start + i*step``), so
    golden parity is untouched.  The product form matters because the
    windowed path (:func:`laserscan_sparse` with
    ``cfg.laserscan_entry_window``) must recompute individual samples at
    dynamic indices without a gather — ``convert(k) * resolution`` in-fusion
    is only consistent with the table if the table itself is built the same
    way (in float32 the two forms differ by 1 ulp at 17 of the 60 entries).
    """
    k = jnp.arange(LASER_NUM_RANGE_SAMPLES).astype(dtype)
    return k * jnp.asarray(LASER_RANGE_RESOLUTION, dtype)


def _ego_rows(x, ego_idx):
    """Static-subset row gather: with ``ego_idx`` a (static) tuple of agent
    indices, restrict an ego-axis array to those rows; None keeps all."""
    if ego_idx is None:
        return x
    return x[jnp.asarray(ego_idx, jnp.int32)]


def laserscan(state, cfg, dynamic_map, ego_idx=None):
    """Batched ray-march over the agent-stamped occupancy grid.

    Replicates ``LaserScanSensor.sense`` (LaserScanSensor.py:49-101): a
    (beams x range-samples) grid of sample points, map lookup with the ego
    disc masked out, and the reference's cumsum==1 "first hit" rule —
    including its literal semantics that the LAST index with cumsum==1 wins
    (a thick obstacle yields the first-hit range; a 1-cell-thin one reads
    past it).

    Args:
        ego_idx: optional static tuple of agent indices to sense FOR
            (per-agent sensor equipage, envs/agent.py:31-33); the world —
            every stamped disc — stays full.  None senses for all agents.

    Returns:
        ranges [A_ego, num_beams] in meters (A_ego = len(ego_idx) or A).
    """
    L = cfg.laserscan_length
    dtype = state.pos.dtype
    H, W = dynamic_map.shape
    angles0 = jnp.linspace(LASER_MIN_ANGLE, LASER_MAX_ANGLE, L).astype(dtype)
    rsamples = _range_samples(dtype)
    R = rsamples.shape[0]

    pos_e = _ego_rows(state.pos, ego_idx)
    A = pos_e.shape[0]
    angles = angles0[None, :] + _ego_rows(state.heading, ego_idx)[:, None]  # [A, L]
    cos_a = jnp.cos(angles)
    sin_a = jnp.sin(angles)

    # Ego-disc mask parameters (LaserScanSensor.py:76-77).
    gi, gj, ego_in_map = map_grid.world_to_map(pos_e, cfg, dynamic_map.shape)
    r_cells_sq = (_ego_rows(state.radius, ego_idx) / cfg.map_grid_cell_size) ** 2

    # March the range axis with a scan so memory stays [A, L] per step —
    # materializing the full [batch, A, L, R] sample tensor OOMs at scale.
    # The carry replicates the reference's cumsum==1 "first hit" rule: the
    # LAST sample index whose running hit-count equals 1 wins (numpy
    # fancy-assignment order).
    def body(carry, inp):
        cnt, idx = carry
        r, k = inp
        px = pos_e[:, None, 0] + r * cos_a                      # [A, L]
        py = pos_e[:, None, 1] + r * sin_a
        pts = jnp.stack([px, py], axis=-1)
        ii, jj, in_map = map_grid.world_to_map(pts, cfg, dynamic_map.shape)
        ii_c = jnp.clip(ii, 0, H - 1)
        jj_c = jnp.clip(jj, 0, W - 1)
        occupied = dynamic_map[ii_c, jj_c]
        in_ego = (
            (jj_c - gj[:, None]) ** 2 + (ii_c - gi[:, None]) ** 2
            < r_cells_sq[:, None]
        ) & ego_in_map[:, None]
        hit = occupied & ~in_ego & in_map
        cnt = cnt + hit.astype(jnp.int32)
        idx = jnp.where(cnt == 1, k, idx)
        return (cnt, idx), None

    init = (
        jnp.zeros((A, L), jnp.int32),
        jnp.full((A, L), -1, jnp.int32),
    )
    (cnt, idx), _ = jax.lax.scan(
        body, init, (rsamples, jnp.arange(R, dtype=jnp.int32))
    )
    return jnp.where(idx >= 0, rsamples[jnp.maximum(idx, 0)], LASER_MAX_RANGE)


def _wedge_screen(state, cfg, pos_e, heading_e, ego_global, num_blocks):
    """Conservative per-(ego, beam-block) disc candidacy [A_ego, B, A_o].

    A disc can contribute a hit to a beam block only if (a) it is within
    sample reach of the ego and (b) its tangent cone (inflated by the
    quantization slack) overlaps the block's angular span.  Both conditions
    are *necessary* for a quantized-cell hit: the in-disc test compares
    floor'd cell indices, and ``|floor(a) - floor(b) - (a - b)| < 1`` per
    coordinate bounds the quantized-vs-continuous distance error by sqrt(2)
    cells — so any hit sample lies within ``(rc + sqrt2) * cell`` of the
    disc center in world space (1.5 cells + small angular/length epsilons
    are used for margin).  The screen is therefore exact-conservative: it
    never excludes a disc that could produce a hit.

    The ego's own disc is excluded: its hits satisfy the identical
    ``in_ego`` predicate and are always erased downstream.
    """
    L = cfg.laserscan_length
    cell = cfg.map_grid_cell_size
    A_o = state.pos.shape[0]
    r_max = (jnp.ceil(LASER_MAX_RANGE / LASER_RANGE_RESOLUTION) - 1.0) * (
        LASER_RANGE_RESOLUTION
    )

    rel = state.pos[None, :, :] - pos_e[:, None, :]           # [A_ego, A_o, 2]
    d = jnp.sqrt(rel[..., 0] ** 2 + rel[..., 1] ** 2)
    rhit = (state.radius / cell + 1.5) * cell                  # [A_o]
    reach_ok = d <= r_max + rhit[None, :] + 1e-3

    phi = jnp.arctan2(rel[..., 1], rel[..., 0]) - heading_e[:, None]
    phi = jnp.mod(phi + jnp.pi, 2.0 * jnp.pi) - jnp.pi
    ratio = jnp.clip(rhit[None, :] / jnp.maximum(d, 1e-9), 0.0, 1.0)
    half = jnp.arcsin(ratio) + 1e-3
    inside = d <= rhit[None, :]

    # Beam-block angular spans from the actual beam table.
    angles_np = np.linspace(
        float(LASER_MIN_ANGLE), float(LASER_MAX_ANGLE), L
    ).reshape(num_blocks, L // num_blocks)
    lo_b = jnp.asarray(angles_np[:, 0], phi.dtype)             # [B]
    hi_b = jnp.asarray(angles_np[:, -1], phi.dtype)

    # interval [phi-half, phi+half] (mod 2pi) vs block span: test the three
    # unwrapped copies of phi.
    isect = jnp.zeros(phi.shape + (num_blocks,), bool)
    for shift in (-2.0 * jnp.pi, 0.0, 2.0 * jnp.pi):
        pc = phi + shift
        isect = isect | (
            (pc[..., None] - half[..., None] <= hi_b)
            & (pc[..., None] + half[..., None] >= lo_b)
        )
    ok = (isect | inside[..., None]) & reach_ok[..., None]     # [A_ego, A_o, B]
    not_self = jnp.arange(A_o)[None, :] != ego_global[:, None]
    return jnp.moveaxis(ok, -1, 1), not_self                   # [A_ego, B, A_o]


# Conservative half-width (in cells) of the band around a source boundary
# where the cell-quantized hit predicate can disagree with the continuous
# one: |floor(a) - floor(b) - (a - b)| < 1 per coordinate bounds the
# quantized-vs-continuous center distance error by sqrt(2) cells; 0.05
# covers float rounding between the analytic band and the per-sample
# arithmetic.
_WINDOW_CELL_SLACK = float(np.sqrt(2.0)) + 0.05

# Axis order of the windowed pass (see _windowed_first_two_hits): True =
# window axis in sublane position [A, S, Wn, Lb] (pad is a function of W
# alone), False = round-3 [A, Wn, S, Lb] (sources in sublanes).  Output
# is bit-identical either way — purely a tiling/performance choice.
_WN_SUBLANE = False

# Beam-compacted window pass shape (see _windowed_beam_compacted): True
# folds (slots, window) into one Cs*Wn axis (clean sublane tiling),
# False keeps [A, Cs, Wn, Lb].  Bit-identical either way.
_FOLD_CW = False


def _two_smallest_distinct(acc, val):
    """Variadic-reduce combiner: each operand pair carries the two smallest
    DISTINCT values of its subset (second = sentinel when fewer than two
    distinct exist, with sentinel > all real values).  Associative and
    commutative: the result depends only on the union's distinct-value
    set."""
    a1, a2 = acc
    b1, b2 = val
    m1 = jnp.minimum(a1, b1)
    ca = jnp.where(a1 > m1, a1, a2)
    cb = jnp.where(b1 > m1, b1, b2)
    return m1, jnp.minimum(ca, cb)


def _windowed_first_two_hits(pos_e, gi_e, gj_e, rsq_e, cos_b, sin_b,
                             gi_d, gj_d, rsq_d, cx_d, cy_d,
                             cfg, H, W_map, Wn, dtype, span_ok=None):
    """Laserscan ranges [A, Lb] via per-source entry windows.

    The reference's cumsum==1 rule (LaserScanSensor.py:63-82) depends only
    on the first two hit indices k1/k2 along each beam.  For every
    (ego, source, beam) this evaluates the EXACT cell-quantized hit
    predicate — identical arithmetic to :func:`laserscan_sparse`'s full
    pass — but only on a ``Wn``-sample window starting one sample before
    the source's analytic entry range (center ``cx/cy`` world meters,
    boundary band inflated by :data:`_WINDOW_CELL_SLACK` cells).  Every
    hit a source can produce before its first guaranteed-interior sample
    lies in that band, so k1 and k2 are recovered exactly while the range
    axis shrinks from R=60 samples to ``Wn``.  Bit-identical to the full
    pass iff no (ego, source, beam) needs a span wider than ``Wn`` —
    validate with :func:`laserscan_window_span`.

    Sources are discs (``rsq_d`` = radius in cells, squared) or static
    occupied cells encoded as ``rsq_d = 1``: for integer cell deltas,
    ``di^2 + dj^2 < 1``  <=>  ``di == 0 and dj == 0``, the membership test
    of the full pass.  Layout: the window axis sits in SUBLANE position
    ([A, S, Wn, Lb], beams minor) so Lb = 128k tiles the VPU lanes.

    Returns ``(ranges [A, Lb], overflow bool scalar)``: overflow is True
    iff some (ego, source, beam) marked usable by ``span_ok`` [A, S]
    (None = all) needs a span wider than ``Wn`` — the exact condition
    :func:`laserscan_window_span` diagnoses offline, evaluated in-graph
    on the same intermediates the window pass already materializes (its
    arithmetic mirrors that function's, so the two always agree).  When
    overflow is True the returned ranges are NOT guaranteed bit-identical
    to the full pass.
    """
    R = LASER_NUM_RANGE_SAMPLES
    cell = cfg.map_grid_cell_size
    res = jnp.asarray(LASER_RANGE_RESOLUTION, dtype)
    oi = (cfg.map_y_width / 2.0) / cell
    oj = (cfg.map_x_width / 2.0) / cell

    # Analytic entry range of the slack-inflated source along each beam.
    relx = cx_d - pos_e[:, 0][:, None]                           # [A, S]
    rely = cy_d - pos_e[:, 1][:, None]
    t_c = (
        relx[:, :, None] * cos_b[:, None, :]
        + rely[:, :, None] * sin_b[:, None, :]
    )                                                            # [A, S, Lb]
    bb = (relx**2 + rely**2)[:, :, None] - t_c**2
    r_out = (jnp.sqrt(rsq_d) + _WINDOW_CELL_SLACK) * cell        # [A, S]
    disc = r_out[:, :, None] ** 2 - bb
    half_o = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_lo = t_c - half_o
    k0 = jnp.floor(t_lo / res).astype(jnp.int32) - 1             # margin -1
    k0 = jnp.clip(k0, 0, R)
    k0 = jnp.where(disc > 0.0, k0, R)                            # unreachable

    # In-graph overflow guard: the span each (ego, source, beam) NEEDS
    # for bit-exactness, mirroring :func:`laserscan_window_span`'s
    # arithmetic on the intermediates already computed above (so the
    # offline diagnostic and this guard can never disagree).  ~10 extra
    # elementwise ops on [A, S, Lb] vs the Wn-times-larger window pass —
    # fuses into the same kernel, no extra HBM traffic.
    t_hi = t_c + half_o
    r_in = jnp.maximum(jnp.sqrt(rsq_d) - _WINDOW_CELL_SLACK, 0.0) * cell
    inner = (r_in**2)[:, :, None] - bb
    half_i = jnp.sqrt(jnp.maximum(inner, 0.0))
    t_g = t_c - half_i
    covered2 = (inner > 0.0) & (t_g + res <= t_c + half_i)
    t_need = jnp.where(covered2, t_g + res, t_hi)
    t_max = (R - 1) * res
    relevant = (disc > 0.0) & (t_hi > 0.0) & (t_lo < t_max)
    if span_ok is not None:
        relevant = relevant & span_ok[:, :, None]
    k0s = jnp.maximum(
        jnp.floor(jnp.clip(t_lo, 0.0, t_max) / res).astype(jnp.int32) - 1, 0
    )
    k1n = jnp.floor(jnp.clip(t_need, 0.0, t_max) / res).astype(jnp.int32) + 1
    overflow = jnp.any(relevant & (k1n - k0s + 1 > Wn))

    # Exact predicate on the window samples (same ops as the full pass:
    # px = pos + rr*cos, i = floor(oi - py/cell), integer deltas).
    # Layout: the (8, 128)-tiled minor two dims are (sublane, beams).
    # _WN_SUBLANE=True puts the WINDOW axis in sublane position
    # ([A, S, Wn, Lb]): Wn pads to the next multiple of 8 regardless of
    # the source count, so a compacted candidate axis of 9-11 sources no
    # longer pads 11 -> 16 sublanes (45 % dead rows); it also makes any
    # W <= 16 cost the same tile footprint.  False is the round-3
    # [A, Wn, S, Lb] order (sources in sublanes).
    if _WN_SUBLANE:
        k = (
            k0[:, :, None, :]
            + jnp.arange(Wn, dtype=jnp.int32)[None, None, :, None]
        )                                                        # [A,S,Wn,Lb]

        def srcx(v):                                             # [A, S] ->
            return v[:, :, None, None]
    else:
        k = (
            k0[:, None, :, :]
            + jnp.arange(Wn, dtype=jnp.int32)[None, :, None, None]
        )                                                        # [A,Wn,S,Lb]

        def srcx(v):
            return v[:, None, :, None]
    valid_k = k < R
    rr = k.astype(dtype) * res                                   # == table[k]
    px = pos_e[:, 0][:, None, None, None] + rr * cos_b[:, None, None, :]
    py = pos_e[:, 1][:, None, None, None] + rr * sin_b[:, None, None, :]
    ii = jnp.floor(oi - py / cell).astype(jnp.int32)
    jj = jnp.floor(oj + px / cell).astype(jnp.int32)
    in_map = (ii >= 0) & (jj >= 0) & (ii < H) & (jj < W_map)
    di = ii - srcx(gi_d)
    dj = jj - srcx(gj_d)
    in_src = di * di + dj * dj < srcx(rsq_d)
    dei = ii - gi_e[:, None, None, None]
    dej = jj - gj_e[:, None, None, None]
    in_ego = dei * dei + dej * dej < rsq_e[:, None, None, None]
    hit = in_src & ~in_ego & in_map & valid_k

    BIG = R
    idx = jnp.where(hit, k, BIG)
    # k1/k2 = the two smallest DISTINCT hit indices, in ONE variadic
    # reduce.  Two separate min-reductions (k2 masked by idx > k1) made
    # XLA materialize the whole hit-producing chain twice — the device
    # trace showed the block body as two near-equal fusions.
    k1, k2 = jax.lax.reduce(
        (idx, jnp.full_like(idx, BIG)),
        (jnp.int32(BIG), jnp.int32(BIG)),
        _two_smallest_distinct,
        (1, 2),
    )                                                            # [A, Lb]
    ans_k = jnp.where(k1 >= BIG, -1, jnp.where(k2 >= BIG, R - 1, k2 - 1))
    val = jnp.where(
        ans_k >= 0, ans_k.astype(dtype) * res, jnp.asarray(LASER_MAX_RANGE, dtype)
    )
    return val.astype(dtype), overflow


def _windowed_beam_compacted(pos_e, gi_e, gj_e, rsq_e, cos_b, sin_b,
                             gi_d, gj_d, rsq_d, cx_d, cy_d,
                             cfg, H, W_map, Wn, dtype, span_ok=None):
    """Entry windows + per-BEAM source compaction: ranges [A, Lb].

    :func:`_windowed_first_two_hits` tests every (ego, source) pair on
    every beam of a block, but a beam's sample segment crosses the
    inflated analytic band of only a few sources (the 20-agent benchmark
    trajectory peaks at 4 while carrying 9-10 block-level candidates,
    76 % of beams cross zero).  This variant screens sources per beam
    first — a source whose band the beam segment does not cross can
    produce no cell-quantized hit, the same inflation argument that
    bounds the entry window — and compacts the survivors' per-beam
    fields (k0, cell center, radius) into ``Cs =
    cfg.laserscan_beam_slots`` slots by the stable cumsum-rank one-hot
    trick (no sort/gather).  The window pass then runs on [A, Cs, Wn,
    Lb] instead of [A, S, Wn, Lb].

    Bit-identical to the uncompacted windowed pass (hence to the full
    range axis) iff no (ego, beam) ever has more than ``Cs``
    band-crossing sources AND no needed span exceeds ``Wn``.  Both
    conditions feed the returned overflow flag (checked per step via
    ``env_step`` info); the span condition is guarded by a closed-form
    per-source bound (see the inline derivation) that is conservative —
    it can trip for a trajectory whose exact per-beam spans all fit
    (size ``Wn`` offline with :func:`laserscan_window_span`, whose exact
    check this bound dominates), but can never pass an unsafe one.
    Returns ``(ranges [A, Lb], overflow scalar)``.
    """
    R = LASER_NUM_RANGE_SAMPLES
    Cs = cfg.laserscan_beam_slots
    cell = cfg.map_grid_cell_size
    res = jnp.asarray(LASER_RANGE_RESOLUTION, dtype)
    oi = (cfg.map_y_width / 2.0) / cell
    oj = (cfg.map_x_width / 2.0) / cell

    # ---- screen pass over the full source set: [A, S, Lb] ----
    relx = cx_d - pos_e[:, 0][:, None]                           # [A, S]
    rely = cy_d - pos_e[:, 1][:, None]
    t_c = (
        relx[:, :, None] * cos_b[:, None, :]
        + rely[:, :, None] * sin_b[:, None, :]
    )                                                            # [A, S, Lb]
    bb = (relx**2 + rely**2)[:, :, None] - t_c**2
    r_out = (jnp.sqrt(rsq_d) + _WINDOW_CELL_SLACK) * cell        # [A, S]
    disc = r_out[:, :, None] ** 2 - bb
    half_o = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_lo = t_c - half_o
    t_hi = t_c + half_o
    t_max_f = (R - 1) * res
    # slot screen: conservative superset of "can produce a hit" (note
    # the non-strict boundary comparisons vs the guard's strict ones)
    rel = (disc > 0.0) & (t_hi >= 0.0) & (t_lo <= t_max_f)
    if span_ok is not None:
        rel = rel & span_ok[:, :, None]
    # same k0 arithmetic as the uncompacted kernel (bit-for-bit)
    k0 = jnp.clip(jnp.floor(t_lo / res).astype(jnp.int32) - 1, 0, R)

    # Window-span exactness guard via a closed-form PER-SOURCE bound —
    # no beam axis (the exact per-beam span check cloned the whole
    # screen chain into a second full-size fusion, ~9 % of the step).
    # Derivation: the needed span is t_need - t_lo where t_need = t_g +
    # res (deflated disc pierced for a full sample) or t_hi (grazing).
    # Piercing: half_o - half_i + res is increasing in bb and covered2
    # requires 2*half_i >= res, so at the boundary half_i = res/2,
    # half_o = sqrt(r_out^2 - r_in^2 + res^2/4)  =>  delta <=
    # sqrt(r_out^2 - r_in^2 + res^2/4) + res/2.  Grazing: 2*half_o with
    # bb > r_in^2 - res^2/4  =>  delta <= 2*sqrt(r_out^2 - r_in^2 +
    # res^2/4).  The second dominates.  In samples (k0 = floor(t_lo/res)
    # - 1 clipped, k1n = floor(t_need/res) + 1): span <= floor(delta/
    # res) + 4; the extra res/2 margin absorbs f32 rounding of the bound
    # itself without changing any integer value reachable by the
    # reference's radii.  Conservative: may trip for a scenario whose
    # actual per-beam spans all fit (use laserscan_window_span to size W
    # offline); can never pass a scenario that needs a wider window.
    r_in = jnp.maximum(jnp.sqrt(rsq_d) - _WINDOW_CELL_SLACK, 0.0) * cell
    dmax = 2.0 * jnp.sqrt(
        jnp.maximum(r_out**2 - r_in**2, 0.0) + (res / 2.0) ** 2
    )                                                            # [A, S]
    span_bound = jnp.floor((dmax + res / 2.0) / res).astype(jnp.int32) + 4
    src_used = rsq_d > 0
    if span_ok is not None:
        src_used = src_used & span_ok
    span_overflow = jnp.any(src_used & (span_bound > Wn))

    # ---- compact the survivors to Cs slots per beam ----
    # Measured design notes (v5e): four separate per-field reduces beat
    # a variadic 4-tuple lax.reduce (-8 %) and beat materializing the
    # slot key behind an optimization_barrier (-3 %); ONE reduce of a
    # bit-packed field word beats them all (+9 %); folding the guards
    # into the same reduce as probe rows removes the separate any-reduce
    # that cloned the entire screen chain into a second full-size fusion.
    slot = jnp.cumsum(rel.astype(jnp.int32), axis=1) - 1         # [A, S, Lb]

    # The radius test `di^2 + dj^2 < rsq` (int vs f32) is equivalent to
    # the pure-int test against irsq = floor(rsq) + (rsq > floor(rsq)):
    # for integers i, i < rsq  <=>  i < ceil(rsq) (rsq fractional) and
    # i < rsq (rsq integral) — exact, no rounding involved.
    irsq = (jnp.floor(rsq_d) + (rsq_d > jnp.floor(rsq_d))).astype(jnp.int32)
    can_pack = H <= 512 and W_map <= 512 and R <= 63
    if can_pack:
        # k0(6b, <<24) | irsq(6b, <<18) | gi(9b, <<9) | gj(9b) = 30 bits.
        # irsq's 6 bits cover radii up to ~0.79 m on a 0.1 m grid (the
        # reference's agents are <= 0.5 m); a larger disc is clamped —
        # which could only shrink it — AND trips the exactness-overflow
        # flag below, so it can never silently change results.
        irsq_p = jnp.minimum(irsq, 63)
        packed = (
            (k0 << 24)
            | (irsq_p[:, :, None] << 18)
            | (gi_d.astype(jnp.int32)[:, :, None] << 9)
            | gj_d.astype(jnp.int32)[:, :, None]
        )                                                        # [A, S, Lb]
        # slot-count guard probe riding the same reduce: one extra
        # onehot row (rank Cs) holds the (Cs+1)-th relevant source's
        # packed word — nonzero iff some beam overflows its slots (a
        # relevant source's word is never 0 because its radius > 0
        # forces irsq_p >= 1).  A plain axis extension, NOT a
        # concatenate: concatenating a separate guard row broke the
        # fusion and cost 30 % end-to-end.
        onehot = rel[:, None, :, :] & (
            slot[:, None, :, :]
            == jnp.arange(Cs + 1, dtype=jnp.int32)[None, :, None, None]
        )                                                        # [A,Cs+1,S,Lb]
        red = jnp.sum(
            jnp.where(onehot, packed[:, None, :, :], 0),
            axis=2, dtype=jnp.int32,
        )                                                        # [A,Cs+1,Lb]
        p_c = red[:, :Cs]
        overflow = span_overflow | jnp.any(red[:, Cs] != 0)
        overflow = overflow | jnp.any(src_used & (irsq > 63))
        k0_c = p_c >> 24
        rsq_c = (p_c >> 18) & 63
        gi_c = (p_c >> 9) & 511
        gj_c = p_c & 511
    else:
        onehot = rel[:, None, :, :] & (
            slot[:, None, :, :]
            == jnp.arange(Cs, dtype=jnp.int32)[None, :, None, None]
        )                                                        # [A,Cs,S,Lb]

        def compact(v):
            """[A, 1|Cs, S, Lb]-broadcastable -> [A, Cs, Lb]; one term
            per slot, so integer sums are exact (dtype pinned: jnp.sum
            would promote int32 -> int64 under x64)."""
            return jnp.sum(jnp.where(onehot, v, 0), axis=2, dtype=v.dtype)

        overflow = span_overflow | jnp.any(
            jnp.sum(rel, axis=1, dtype=jnp.int32) > Cs
        )
        k0_c = compact(k0[:, None, :, :])
        gi_c = compact(gi_d.astype(jnp.int32)[:, None, :, None])
        gj_c = compact(gj_d.astype(jnp.int32)[:, None, :, None])
        # empty slots: rsq 0 makes the integer disc test unsatisfiable
        rsq_c = compact(irsq[:, None, :, None])

    # ---- window pass on the compacted slots ----
    A_e, _, Lb = k0_c.shape
    if _FOLD_CW:
        # fold (Cs, Wn) into one axis of Cs*Wn: the [A, Cs, Wn, Lb]
        # shape puts Wn in sublane position where Wn=12 pads to 16 (33 %
        # dead rows); the folded axis is a multiple of 4 and tiles clean
        CW = Cs * Wn
        w_of = jnp.arange(CW, dtype=jnp.int32) % Wn              # [CW]

        def fold(v):                                             # [A,Cs,Lb]
            return jnp.broadcast_to(
                v[:, :, None, :], (A_e, Cs, Wn, Lb)
            ).reshape(A_e, CW, Lb)

        k = fold(k0_c) + w_of[None, :, None]
        gi_w, gj_w, rsq_w = fold(gi_c), fold(gj_c), fold(rsq_c)
        pos_x = pos_e[:, 0][:, None, None]
        pos_y = pos_e[:, 1][:, None, None]
        cos_w = cos_b[:, None, :]
        sin_w = sin_b[:, None, :]
        gi_ew = gi_e[:, None, None]
        gj_ew = gj_e[:, None, None]
        rsq_ew = rsq_e[:, None, None]
        red_axes = (1,)
    else:
        k = (
            k0_c[:, :, None, :]
            + jnp.arange(Wn, dtype=jnp.int32)[None, None, :, None]
        )                                                        # [A,Cs,Wn,Lb]
        gi_w = gi_c[:, :, None, :]
        gj_w = gj_c[:, :, None, :]
        rsq_w = rsq_c[:, :, None, :]
        pos_x = pos_e[:, 0][:, None, None, None]
        pos_y = pos_e[:, 1][:, None, None, None]
        cos_w = cos_b[:, None, None, :]
        sin_w = sin_b[:, None, None, :]
        gi_ew = gi_e[:, None, None, None]
        gj_ew = gj_e[:, None, None, None]
        rsq_ew = rsq_e[:, None, None, None]
        red_axes = (1, 2)
    # NOTE two exact strength reductions vs the uncompacted kernel:
    # - no `k < R` mask: a "hit" at k >= R yields idx = k >= BIG = R,
    #   which the two-smallest reduce and the ans_k >= BIG tests already
    #   treat as a miss;
    # - in_map via unsigned compares: 0 <= i < H  <=>  (u32)i < H.
    rr = k.astype(dtype) * res
    px = pos_x + rr * cos_w
    py = pos_y + rr * sin_w
    ii = jnp.floor(oi - py / cell).astype(jnp.int32)
    jj = jnp.floor(oj + px / cell).astype(jnp.int32)
    in_map = (ii.astype(jnp.uint32) < H) & (jj.astype(jnp.uint32) < W_map)
    di = ii - gi_w
    dj = jj - gj_w
    in_src = di * di + dj * dj < rsq_w
    dei = ii - gi_ew
    dej = jj - gj_ew
    in_ego = dei * dei + dej * dej < rsq_ew
    hit = in_src & ~in_ego & in_map

    BIG = R
    idx = jnp.where(hit, k, BIG)
    k1, k2 = jax.lax.reduce(
        (idx, jnp.full_like(idx, BIG)),
        (jnp.int32(BIG), jnp.int32(BIG)),
        _two_smallest_distinct,
        red_axes,
    )                                                            # [A, Lb]
    ans_k = jnp.where(k1 >= BIG, -1, jnp.where(k2 >= BIG, R - 1, k2 - 1))
    val = jnp.where(
        ans_k >= 0, ans_k.astype(dtype) * res,
        jnp.asarray(LASER_MAX_RANGE, dtype)
    )
    return val.astype(dtype), overflow


def _static_cell_sources(static_cells, cfg, dtype):
    """Static occupied cells as windowed sources: exact cell targets plus
    world-space centers for the analytic band (rsq = 1 makes the integer
    disc test an equality test).  Padding rows (-1, -1) only match
    out-of-map samples, which the in-map mask erases — same argument as the
    full pass."""
    cell = cfg.map_grid_cell_size
    oi = (cfg.map_y_width / 2.0) / cell
    oj = (cfg.map_x_width / 2.0) / cell
    ci = static_cells[:, 0]
    cj = static_cells[:, 1]
    cx = (cj.astype(dtype) + 0.5 - oj) * cell
    cy = (oi - ci.astype(dtype) - 0.5) * cell
    rsq = jnp.ones((static_cells.shape[0],), dtype)
    return ci, cj, rsq, cx, cy


def laserscan_window_span(state, cfg, static_cells=None, ego_idx=None):
    """Diagnostic: the maximum window span (in range samples) any
    (ego, source, beam) needs for :func:`laserscan_sparse` with
    ``cfg.laserscan_entry_window = W`` to be bit-identical to the full
    pass.  W is safe for the states being run iff this never exceeds it.

    The needed span covers the analytic entry band of the slack-inflated
    source through its first guaranteed-interior sample (when the
    deflated source is pierced for at least one full sample step) or
    through the band's far edge (grazing geometry — every hit is fuzzy,
    and the second hit can sit anywhere in the band).
    """
    dtype = state.pos.dtype
    L = cfg.laserscan_length
    cell = cfg.map_grid_cell_size
    res = float(LASER_RANGE_RESOLUTION)
    R = LASER_NUM_RANGE_SAMPLES
    H = int(cfg.map_y_width / cfg.map_grid_cell_size)
    W_map = int(cfg.map_x_width / cfg.map_grid_cell_size)
    A_o = state.pos.shape[0]

    pos_e = _ego_rows(state.pos, ego_idx)
    angles0 = jnp.linspace(LASER_MIN_ANGLE, LASER_MAX_ANGLE, L).astype(dtype)
    angles = angles0[None, :] + _ego_rows(state.heading, ego_idx)[:, None]
    cos_b = jnp.cos(angles)
    sin_b = jnp.sin(angles)

    _gi, _gj, center_in_map = map_grid.world_to_map(state.pos, cfg, (H, W_map))
    disc_valid = center_in_map & state.valid
    ego_global = (
        jnp.arange(A_o, dtype=jnp.int32)
        if ego_idx is None
        else jnp.asarray(ego_idx, jnp.int32)
    )
    not_self = jnp.arange(A_o)[None, :] != ego_global[:, None]

    rsq = (state.radius / cell) ** 2
    cx = state.pos[:, 0]
    cy = state.pos[:, 1]
    src_ok = disc_valid[None, :] & not_self                      # [A_e, A_o]
    if static_cells is not None and static_cells.shape[0] > 0:
        _ci, _cj, rsq_s, cx_s, cy_s = _static_cell_sources(
            static_cells, cfg, dtype
        )
        rsq = jnp.concatenate([rsq, rsq_s.astype(rsq.dtype)])
        cx = jnp.concatenate([cx, cx_s.astype(cx.dtype)])
        cy = jnp.concatenate([cy, cy_s.astype(cy.dtype)])
        pad_ok = jnp.broadcast_to(
            (static_cells[:, 0] >= 0)[None, :],
            (src_ok.shape[0], static_cells.shape[0]),
        )
        src_ok = jnp.concatenate([src_ok, pad_ok], axis=1)

    relx = cx[None, :] - pos_e[:, 0][:, None]                    # [A_e, S]
    rely = cy[None, :] - pos_e[:, 1][:, None]
    t_c = (
        relx[:, :, None] * cos_b[:, None, :]
        + rely[:, :, None] * sin_b[:, None, :]
    )
    bb = (relx**2 + rely**2)[:, :, None] - t_c**2
    r_out = (jnp.sqrt(rsq) + _WINDOW_CELL_SLACK) * cell
    r_in = jnp.maximum(jnp.sqrt(rsq) - _WINDOW_CELL_SLACK, 0.0) * cell
    disc = r_out[None, :, None] ** 2 - bb
    inner = r_in[None, :, None] ** 2 - bb
    half_o = jnp.sqrt(jnp.maximum(disc, 0.0))
    half_i = jnp.sqrt(jnp.maximum(inner, 0.0))
    t_lo = t_c - half_o
    t_hi = t_c + half_o
    t_g = t_c - half_i
    covered2 = (inner > 0.0) & (t_g + res <= t_c + half_i)
    t_need = jnp.where(covered2, t_g + res, t_hi)

    t_max = (R - 1) * res
    relevant = (disc > 0.0) & (t_hi > 0.0) & (t_lo < t_max) & src_ok[:, :, None]
    k0 = jnp.floor(jnp.clip(t_lo, 0.0, t_max) / res).astype(jnp.int32) - 1
    k0 = jnp.maximum(k0, 0)
    k1n = jnp.floor(jnp.clip(t_need, 0.0, t_max) / res).astype(jnp.int32) + 1
    span = jnp.where(relevant, k1n - k0 + 1, 0)
    return int(jnp.max(span))


def laserscan_wedge_candidate_counts(state, cfg, ego_idx=None, num_blocks=4):
    """Diagnostic: per-(ego, block) count of discs passing the conservative
    wedge screen.  ``laserscan_sparse`` with
    ``cfg.laserscan_num_candidate_discs = C`` is bit-identical to the full
    path iff this never exceeds C over the states being run (the screen
    itself is exact-conservative; only slot overflow can drop a real hit).
    """
    H = int(cfg.map_y_width / cfg.map_grid_cell_size)
    W = int(cfg.map_x_width / cfg.map_grid_cell_size)
    pos_e = _ego_rows(state.pos, ego_idx)
    heading_e = _ego_rows(state.heading, ego_idx)
    ego_global = (
        jnp.arange(state.pos.shape[0], dtype=jnp.int32)
        if ego_idx is None
        else jnp.asarray(ego_idx, jnp.int32)
    )
    _gi, _gj, center_in_map = map_grid.world_to_map(state.pos, cfg, (H, W))
    disc_valid = center_in_map & state.valid
    ok, not_self = _wedge_screen(state, cfg, pos_e, heading_e, ego_global,
                                 num_blocks)
    ok = ok & (disc_valid[None, None, :] & not_self[:, None, :])
    return jnp.sum(ok, axis=-1)                                 # [A_ego, B]


def laserscan_sparse(state, cfg, static_cells, ego_idx=None,
                     return_overflow=False):
    """Gather-free laserscan: identical outputs to :func:`laserscan`, but
    occupancy is evaluated *analytically* instead of reading a rasterized
    map — agent discs by the circle-stamp inequality on the sample's cell
    indices, static obstacles by comparison against a (padded) occupied-cell
    list.

    TPU rationale: the gather path reads the map at every (agent x beam x
    range) sample — tens of millions of scalarized gathers per step, which
    dominates everything at scale.  This path is pure vector compares on the
    VPU, no gather at all — and fully vectorized over the range axis (a
    scan over the 60 range samples runs tiny [A, L] steps sequentially and
    leaves the VPU idle; one [A, L, R] pass keeps it fed).

    The reference's cumsum==1 "first hit" rule (the LAST sample index whose
    running hit-count equals 1 wins, numpy fancy-assignment order) reduces
    to two min-reductions: with k1/k2 the first/second hit indices, the
    cnt==1 run is [k1, k2-1] (or [k1, R-1] with a single hit), so the
    answer index is k2-1, R-1, or miss.  The range *value* is then a
    one-hot contraction against the host-computed sample table (selected,
    never recomputed — bit-identical to indexing), cheaper on TPU than a
    cumsum (reduce-window) over the range axis.

    Args:
        static_cells: [S, 2] int32 occupied (i, j) cells of the *static*
            map, padded with -1 rows (see
            :func:`maps.grid.occupied_cell_list`).  S is a static shape.
        ego_idx: optional static tuple of agent indices to sense FOR
            (per-agent sensor equipage); every agent disc stays in the
            world regardless.  None senses for all agents.
        return_overflow: when True, also return a scalar bool that is
            True iff the windowed path (``cfg.laserscan_entry_window``)
            needed a wider span than configured for THIS state — i.e.
            the returned ranges may not be bit-identical to the full
            pass.  Always False when the window is disabled.

    Returns:
        ranges [A_ego, num_beams] in meters (A_ego = len(ego_idx) or A),
        or ``(ranges, window_overflow)`` if ``return_overflow``.
    """
    L = cfg.laserscan_length
    dtype = state.pos.dtype
    H = int(cfg.map_y_width / cfg.map_grid_cell_size)
    W = int(cfg.map_x_width / cfg.map_grid_cell_size)
    angles0 = jnp.linspace(LASER_MIN_ANGLE, LASER_MAX_ANGLE, L).astype(dtype)
    rsamples = _range_samples(dtype)
    R = rsamples.shape[0]

    pos_e = _ego_rows(state.pos, ego_idx)
    angles = angles0[None, :] + _ego_rows(state.heading, ego_idx)[:, None]  # [A, L]
    cos_a = jnp.cos(angles)
    sin_a = jnp.sin(angles)

    # Disc stamps of every agent (Map.add_agents_to_map semantics: only
    # agents whose center is in-map stamp; radius in cells).  Instead of
    # carrying a per-other validity mask into the hot reduce (one extra
    # vector AND per element of the peak-bound [A, R, A_other, L] pass),
    # invalid discs get a sentinel row index far outside any map: di^2
    # alone then exceeds any radius.  The sentinel is capped so
    # di^2 + dj^2 stays below 2^31 (no int32 wraparound): |di| <= ~40200
    # -> di^2 <= 1.62e9, and |dj| <= H+W cells keeps the sum safe.
    gi, gj, center_in_map = map_grid.world_to_map(state.pos, cfg, (H, W))
    r_cells_sq = (state.radius / cfg.map_grid_cell_size) ** 2
    disc_valid = center_in_map & state.valid                    # [A]
    gi = jnp.where(disc_valid, gi, 40000)

    # The hot pass below materializes all (agent, range, beam) sample
    # points for its beam set at once: [A, R, Lb].  Beams sit in the MINOR
    # axis on purpose — Lb is a multiple of the VPU's 128 lanes, so every
    # broadcast/reduce axis added below lands in sublane position and
    # tiles without padding (A_other=20 in the minor axis wasted 84% of
    # each lane tile and dominated the profile).
    #
    # With cfg.laserscan_num_candidate_discs = C set, discs are first
    # compacted per 128-beam block by the exact-conservative wedge screen
    # (:func:`_wedge_screen`): only discs whose inflated tangent cone
    # overlaps a block's angular span can hit its beams, so the hot reduce
    # shrinks from A_o sources to C candidates.  Bit-identical to the full
    # path as long as no (ego, block) exceeds C candidates — validate with
    # :func:`laserscan_wedge_candidate_counts`.
    A_o = state.pos.shape[0]
    A_e = pos_e.shape[0]
    rr = rsamples[None, :, None]                                 # [1, R, 1]
    gi_e = _ego_rows(gi, ego_idx)
    gj_e = _ego_rows(gj, ego_idx)
    rsq_e = _ego_rows(r_cells_sq, ego_idx)

    def _beam_block_ranges(cos_b, sin_b, gi_d, gj_d, rsq_d):
        """Ranges [A_e, Lb] for the beams whose direction cosines are
        ``cos_b/sin_b`` [A_e, Lb], against per-ego disc sets
        ``gi_d/gj_d/rsq_d`` [A_e, S] (S = discs to test per ego).

        The disc reduce is the hot loop at scale and profiles at VPU peak
        (~4 Tops/s); int vs float square made no difference.  Layout: the
        disc axis sits OUTSIDE the (8, 128)-tiled minor two dims —
        [A, S, R, Lb] tiles (R->64, Lb=128k) with 7% pad, vs the old
        [A, R, S, L] which padded S=20 to 24 sublanes.
        """
        px = pos_e[:, None, None, 0] + rr * cos_b[:, None, :]    # [A, R, Lb]
        py = pos_e[:, None, None, 1] + rr * sin_b[:, None, :]
        pts = jnp.stack([px, py], axis=-1)
        ii_b, jj_b, in_map_b = map_grid.world_to_map(pts, cfg, (H, W))

        di = ii_b[:, None, :, :] - gi_d[:, :, None, None]        # [A, S, R, Lb]
        dj = jj_b[:, None, :, :] - gj_d[:, :, None, None]
        in_disc = di * di + dj * dj < rsq_d[:, :, None, None]
        agent_hit = jnp.any(in_disc, axis=1)                     # [A, R, Lb]

        # the ego's own disc is masked out of the whole map
        # (LaserScanSensor.py:76-77) — a single [A, R, Lb] pass
        dei = ii_b - gi_e[:, None, None]
        dej = jj_b - gj_e[:, None, None]
        in_ego = dei * dei + dej * dej < rsq_e[:, None, None]

        # static occupied-cell list membership  [A, S, R, Lb] (cell axis
        # outside the tiled minor dims, same layout rationale).  Padding
        # rows are (-1, -1): only out-of-map samples can produce ii == -1,
        # and those hits are erased by the `& in_map` below, so no explicit
        # pad mask is needed in this pass.
        if static_cells.shape[0] > 0:
            static_hit = jnp.any(
                (ii_b[:, None, :, :] == static_cells[None, :, 0, None, None])
                & (jj_b[:, None, :, :] == static_cells[None, :, 1, None, None]),
                axis=1,
            )
        else:
            static_hit = jnp.zeros_like(agent_hit)

        hit = (agent_hit | static_hit) & ~in_ego & in_map_b      # [A, R, Lb]
        kk = jax.lax.broadcasted_iota(jnp.int32, hit.shape, 1)
        BIG = R + 1
        k1 = jnp.min(jnp.where(hit, kk, BIG), axis=1)            # first hit
        k2 = jnp.min(jnp.where(hit & (kk > k1[:, None, :]), kk, BIG), axis=1)
        ans_k = jnp.where(k1 >= BIG, -1, jnp.where(k2 >= BIG, R - 1, k2 - 1))
        best = jnp.sum(
            jnp.where(
                kk == ans_k[:, None, :], jnp.broadcast_to(rr, hit.shape), 0.0
            ),
            axis=1,
        )
        return jnp.where(ans_k >= 0, best, LASER_MAX_RANGE).astype(dtype)

    C = cfg.laserscan_num_candidate_discs
    Wn = cfg.laserscan_entry_window
    if cfg.laserscan_beam_slots is not None and Wn is None:
        raise ValueError(
            "cfg.laserscan_beam_slots requires cfg.laserscan_entry_window"
        )
    use_wedge = C is not None and C < A_o - 1 and L % 128 == 0

    def _windowed(cos_b, sin_b, gi_d, gj_d, rsq_d, cx_d, cy_d,
                  span_ok=None):
        """Windowed first-two-hits pass over the given per-ego source set
        (static occupied cells appended as rsq=1 equality sources).
        ``span_ok`` [A, S_agents] masks which agent sources count toward
        the overflow guard (None = all; pad/empty slots are parked out of
        analytic reach and self-exclude)."""
        rows = gi_d.shape[0]
        if static_cells.shape[0] > 0:
            _ci, _cj, rsq_s, cx_s, cy_s = _static_cell_sources(
                static_cells, cfg, dtype
            )

            def app(a, b):
                b = jnp.broadcast_to(
                    b[None, :].astype(a.dtype), (rows, b.shape[0])
                )
                return jnp.concatenate([a, b], axis=1)

            if span_ok is None:
                span_ok = jnp.ones(gi_d.shape, bool)
            gi_d = app(gi_d, static_cells[:, 0].astype(jnp.int32))
            gj_d = app(gj_d, static_cells[:, 1].astype(jnp.int32))
            rsq_d = app(rsq_d, rsq_s)
            cx_d = app(cx_d, cx_s)
            cy_d = app(cy_d, cy_s)
            # padding rows (-1, -1) map to a real world point just off the
            # map corner: excluded from the guard (their exact test never
            # hits — out-of-map samples are erased)
            span_ok = app(span_ok, static_cells[:, 0] >= 0)
        kern = (_windowed_beam_compacted
                if cfg.laserscan_beam_slots is not None
                else _windowed_first_two_hits)
        if (_WBC_PALLAS and cfg.laserscan_beam_slots is not None
                and dtype == jnp.float32):
            from gym_collision_avoidance_tpu.ops.laser_pallas import (
                windowed_beam_compacted_pallas as kern,
            )
        return kern(
            pos_e, gi_e, gj_e, rsq_e, cos_b, sin_b,
            gi_d, gj_d, rsq_d, cx_d, cy_d, cfg, H, W, Wn, dtype,
            span_ok=span_ok,
        )

    if not use_wedge:
        gi_all = jnp.broadcast_to(gi[None, :], (A_e, A_o))
        gj_all = jnp.broadcast_to(gj[None, :], (A_e, A_o))
        rsq_all = jnp.broadcast_to(r_cells_sq[None, :], (A_e, A_o))
        if Wn is None:
            out = _beam_block_ranges(cos_a, sin_a, gi_all, gj_all, rsq_all)
            return (out, jnp.asarray(False)) if return_overflow else out
        # the ego's own disc stays in the source set: its in_src predicate
        # is literally the in_ego predicate, so its hits always cancel
        cx_all = jnp.broadcast_to(state.pos[:, 0][None, :], (A_e, A_o))
        cy_all = jnp.broadcast_to(state.pos[:, 1][None, :], (A_e, A_o))
        ego_glob = (
            jnp.arange(A_o, dtype=jnp.int32)
            if ego_idx is None
            else jnp.asarray(ego_idx, jnp.int32)
        )
        # the guard skips invalid discs (their gi sentinel kills the exact
        # test but their cx/cy is a live position) and the ego itself
        # (always cancelled by in_ego, matching laserscan_window_span)
        ns = jnp.arange(A_o)[None, :] != ego_glob[:, None]
        out, ovf = _windowed(cos_a, sin_a, gi_all, gj_all, rsq_all,
                             cx_all.astype(dtype), cy_all.astype(dtype),
                             span_ok=disc_valid[None, :] & ns)
        return (out, ovf) if return_overflow else out

    # Wedge-culled path: compact each 128-beam block's candidate discs via
    # the exact-conservative angular screen, then run the blocks through a
    # lax.scan whose body is one fused [A, C, R, 128] pass (per-block
    # [A, C] candidate scalars broadcast freely into the fusion).  Two
    # rejected variants, both measured slower on TPU: expanding candidates
    # to [A, C, L] via repeat spent the whole saving on materializing
    # those arrays; a static Python loop over blocks made XLA materialize
    # the shared [A, R, L] sample arrays once per consumer.
    B = L // 128
    heading_e = _ego_rows(state.heading, ego_idx)
    ego_global = (
        jnp.arange(A_o, dtype=jnp.int32)
        if ego_idx is None
        else jnp.asarray(ego_idx, jnp.int32)
    )
    ok, not_self = _wedge_screen(state, cfg, pos_e, heading_e,
                                 ego_global, B)                  # [A, B, A_o]
    ok = ok & disc_valid[None, None, :] & not_self[:, None, :]
    # compact to C slots per (ego, block): stable cumsum rank + one-hot
    # contraction (no sort/gather — both scalarize on TPU)
    slot = jnp.cumsum(ok.astype(jnp.int32), axis=-1) - 1         # [A, B, A_o]
    onehot = (
        ok[:, :, None, :]
        & (slot[:, :, None, :] == jnp.arange(C)[None, None, :, None])
    ).astype(jnp.float32)                                        # [A, B, C, A_o]
    occupied = jnp.arange(C)[None, None, :] < jnp.sum(
        ok, axis=-1, dtype=jnp.int32
    )[:, :, None]                                                # [A, B, C]
    # masked sums, not einsums: dot_generals this small lower to bf16
    # convolution emitters on TPU — bf16 would round cell indices >= 257
    # on large maps and costs layout copies (see other_agents_states).
    def _compact(vals_f32):  # [A_o] -> [A, B, C]
        return jnp.sum(onehot * vals_f32[None, None, None, :], axis=-1)

    gi_c = _compact(gi.astype(jnp.float32))
    gj_c = _compact(gj.astype(jnp.float32))
    rsq_c = _compact(r_cells_sq.astype(jnp.float32))
    # empty slots get the same far-out sentinel as invalid discs
    gi_c = jnp.where(occupied, gi_c, 40000.0).astype(jnp.int32)
    gj_c = jnp.where(occupied, gj_c, 0.0).astype(jnp.int32)
    rsq_c = jnp.where(occupied, rsq_c, 0.0).astype(r_cells_sq.dtype)

    cos_blocks = jnp.moveaxis(cos_a.reshape(A_e, B, 128), 1, 0)  # [B, A, 128]
    sin_blocks = jnp.moveaxis(sin_a.reshape(A_e, B, 128), 1, 0)

    extras = ()
    if Wn is not None:
        # windowed blocks additionally need the candidates' world-space
        # centers for the analytic entry band (f32 compaction is fine: the
        # band carries ~5e-3 m of explicit slack, vastly above f32
        # rounding of a position)
        cx_c = _compact(state.pos[:, 0].astype(jnp.float32))
        cy_c = _compact(state.pos[:, 1].astype(jnp.float32))
        # empty slots: park the analytic band out of reach (the 40000-cell
        # gi sentinel already guarantees the exact test is false)
        cx_c = jnp.where(occupied, cx_c, 1e7).astype(dtype)
        cy_c = jnp.where(occupied, cy_c, 0.0).astype(dtype)
        extras = (jnp.moveaxis(cx_c, 1, 0), jnp.moveaxis(cy_c, 1, 0))

    # wedge-compaction exactness guard: slot overflow (more candidates
    # than C slots for some (ego, block)) silently drops a real source —
    # the in-graph twin of :func:`laserscan_wedge_candidate_counts`'s
    # offline check, one reduce on an array the compaction already built
    wedge_ovf = jnp.any(jnp.sum(ok, axis=-1, dtype=jnp.int32) > C)

    def block_body(carry, x):
        cos_b, sin_b, gi_cb, gj_cb, rsq_cb, *rest = x
        if Wn is None:
            return carry, _beam_block_ranges(cos_b, sin_b, gi_cb, gj_cb,
                                             rsq_cb)
        val, ovf = _windowed(cos_b, sin_b, gi_cb, gj_cb, rsq_cb, *rest)
        return carry | ovf, val

    ovf, out = jax.lax.scan(
        block_body,
        wedge_ovf,
        (
            cos_blocks,
            sin_blocks,
            jnp.moveaxis(gi_c, 1, 0),                            # [B, A, C]
            jnp.moveaxis(gj_c, 1, 0),
            jnp.moveaxis(rsq_c, 1, 0),
        )
        + extras,
    )                                                            # [B, A, 128]
    ranges = jnp.moveaxis(out, 0, 1).reshape(A_e, L)
    return (ranges, ovf) if return_overflow else ranges


def occupancy_grid(state, cfg, dynamic_map):
    """Batched 5x5 m ego-centered crop of the dynamic map
    (OccupancyGridSensor.sense, OccupancyGridSensor.py:24-88; out-of-map
    cells are zero-filled).

    Returns:
        [A, 50, 50] bool (5 m / the map's 0.1 m cells).
    """
    H, W = dynamic_map.shape
    cell = cfg.map_grid_cell_size
    x_w = y_w = 5.0
    n_i = int(y_w / cell)
    n_j = int(x_w / cell)
    half = jnp.asarray([x_w / 2.0, y_w / 2.0], state.pos.dtype)

    # upper-left grid corner (max y, min x) -> (i_low, j_low)
    i_low, _, _ = map_grid.world_to_map(state.pos + half, cfg, dynamic_map.shape)
    _, j_low, _ = map_grid.world_to_map(state.pos - half, cfg, dynamic_map.shape)

    rows = i_low[:, None] + jnp.arange(n_i)[None, :]            # [A, n_i]
    cols = j_low[:, None] + jnp.arange(n_j)[None, :]            # [A, n_j]
    rv = (rows >= 0) & (rows < H)
    cv = (cols >= 0) & (cols < W)
    vals = dynamic_map[
        jnp.clip(rows, 0, H - 1)[:, :, None], jnp.clip(cols, 0, W - 1)[:, None, :]
    ]
    return vals & rv[:, :, None] & cv[:, None, :]


def _lex_rank(keys, idx):
    """Stable lexicographic rank of each column entry among all entries.

    ``keys`` is a tuple of [..., N] arrays (primary first); ties beyond the
    keys break by original index — exactly ``np.lexsort``'s stable order.
    Computed as a pairwise O(N^2) comparison + sum, which is pure vector
    math on the VPU; on TPU this beats sort+gather by ~10x for small N
    (sorts and take_along_axis gathers are scalarized).
    """
    def less(a):  # a [..., N] -> [..., N, N]: a_j < a_i
        return a[..., :, None] > a[..., None, :]

    def eq(a):
        return a[..., :, None] == a[..., None, :]

    j_lt_i = idx[:, None] > idx[None, :]
    cmp = j_lt_i
    for k in reversed(keys):
        cmp = less(k) | (eq(k) & cmp)
    return jnp.sum(cmp, axis=-1)                          # [..., N] ranks


def _lex_rank_masked(keys, idx, count_mask):
    """Stable lexicographic rank counting only ``count_mask``-True
    competitors, on RAW (unmasked) keys.

    Value-identical to :func:`_lex_rank` on INF-masked keys for every
    row the caller consumes (rows where ``count_mask`` holds): a
    masked-out competitor contributes 0 either way — its INF key is
    never ``less`` than and never equal to a finite one — and
    masked-out rows' own ranks are unused by construction (``selected``
    always conjoins the mask).  Skips materializing a where-masked copy
    of every key, and lets XLA CSE the pairwise compares between the
    clip rank and the closest_last re-rank (which share ``eq(d)`` and
    the whole (p_orth, idx) tie-break tail on raw arrays — impossible
    when each rank masks its own key copies; the two masked chains were
    21% of the 40-agent step, round-5 trace).
    """
    def less(a):  # [..., N] -> [..., N, N]: a_j < a_i
        return a[..., :, None] > a[..., None, :]

    def eq(a):
        return a[..., :, None] == a[..., None, :]

    cmp = idx[:, None] > idx[None, :]
    for k in reversed(keys):
        cmp = less(k) | (eq(k) & cmp)
    return jnp.sum(cmp & count_mask[..., None, :], axis=-1)


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

    Implementation: the reference's stable lexicographic sorts are computed
    as pairwise-comparison *ranks* and the row gather as a one-hot
    contraction — no sort or gather primitives (both scalarize on TPU and
    dominated the step at scale; see PERF.md).
    """
    A = state.pos.shape[0]
    K = cfg.max_num_other_agents_observed
    dtype = state.pos.dtype

    # [A_host, A_other] relative positions, x/y carried as separate arrays.
    # These 2-term contractions are written as explicit mul+add instead of
    # einsum ON PURPOSE: on TPU, XLA lowers tiny dot_generals under vmap to
    # degenerate convolution emitters with bf16 operands (default matmul
    # precision) and lane-wasting [..., 2]-minor layouts — a serving-loop
    # HLO dump showed them costing layout copies on both sides AND silently
    # rounding f32 inputs through bf16.  Elementwise math is exact f32 and
    # fuses into plain VPU loops (same fix as the CADRL split-action
    # vectors, PERF.md).
    rel_x = state.pos[None, :, 0] - state.pos[:, None, 0]             # [A, A]
    rel_y = state.pos[None, :, 1] - state.pos[:, None, 1]
    # same value order as maths.norm2 on the stacked [A, A, 2] array
    dist_centers = jnp.sqrt(rel_x * rel_x + rel_y * rel_y)            # [A, A]
    p_par = rel_x * state.ref_prll[:, None, 0] + rel_y * state.ref_prll[:, None, 1]
    p_orth = rel_x * state.ref_orth[:, None, 0] + rel_y * state.ref_orth[:, None, 1]
    v_par = (
        state.vel[None, :, 0] * state.ref_prll[:, None, 0]
        + state.vel[None, :, 1] * state.ref_prll[:, None, 1]
    )
    v_orth = (
        state.vel[None, :, 0] * state.ref_orth[:, None, 0]
        + state.vel[None, :, 1] * state.ref_orth[:, None, 1]
    )
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
    idx = jnp.arange(A)
    if method == cfg_mod.SORT_TIME_TO_IMPACT:
        tti = maths.compute_time_to_impact(
            state.pos[:, None, :],
            state.pos[None, :, :],
            state.vel[:, None, :],
            state.vel[None, :, :],
            combined_r,
        )
        # clip sorted by (-tti, -d, p_orth) ascending (":38").
        clip_keys = (-tti, -d_rounded, p_orth)
    else:
        # closest_first / closest_last both clip by (d, p_orth) ascending
        # (":33-39").
        clip_keys = (d_rounded, p_orth)

    # raw keys + boolean competitor mask (see _lex_rank_masked: value-
    # identical to INF-masked keys on every consumed row)
    rank = _lex_rank_masked(clip_keys, idx, visible)                  # [A, A]
    selected = visible & (rank < K)

    # Re-sort the clipped K by the final ordering scheme (":41-50").
    if method == cfg_mod.SORT_CLOSEST_LAST:
        rank = _lex_rank_masked((-d_rounded, p_orth), idx, selected)
    # closest_first and time_to_impact re-sort by the same key as the clip
    # sort, which is a no-op on a stable order.

    # one-hot selection: row k of host h = the entry with rank k.  Done as
    # a per-field masked sum over the other-agent axis, NOT an einsum: the
    # [A, K, A] x [A, A, 7] dot_general lowered to a ~250k-cycle
    # convolution-emitter fusion with bf16 operands (see note above), and
    # stacking `fields` early forced a 7-lane layout.  Exact: at most one
    # summand per (h, k) is nonzero, and adding zeros is exact for finite
    # values.
    slot = jnp.arange(K)
    onehot = (rank[:, None, :] == slot[None, :, None]) & selected[:, None, :]
    onehot_f = onehot.astype(dtype)                                   # [A, K, A]

    fields = (p_par, p_orth, v_par, v_orth, other_r, combined_r, d2other)
    if _SELECT_STACK_IN:
        # Round-5 A/B variant: ONE broadcast masked-sum whose output IS
        # [A, K, 7] — the per-field form (below) ends in a 6-output
        # reduce fusion plus a separate [E, A, K, 7] concatenate
        # (together ~29% of the headline serving step's device time,
        # round-5 trace); here the field stack moves to the INPUT side
        # where it can fuse into the reduce.  Bit-identical: the same
        # one-summand masked sum per (h, k, f).
        stacked = jnp.stack([f.astype(dtype) for f in fields], axis=-1)
        rows = jnp.sum(
            onehot_f[:, :, :, None] * stacked[:, None, :, :], axis=2
        )                                                             # [A, K, 7]
    elif A >= SENSOR_MXU_MIN_A:
        # Bit-identical MXU variant (see SENSOR_MXU_MIN_A: disabled —
        # measured slower; the 7-wide output starves the MXU even with
        # the A-wide contraction).
        stacked = jnp.stack([f.astype(dtype) for f in fields], axis=-1)
        rows = jax.lax.dot_general(
            onehot_f, stacked,
            (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
        )                                                             # [A, K, 7]
    else:
        # small A: the contraction is 2-7 wide — the degenerate-dot
        # regime the round-2 einsum purge removed (bf16-operand
        # convolution emitters + layout copies); masked mul+sum is
        # exact f32 and fuses into plain VPU loops.
        def pick_field(f):  # [A, A] -> [A, K]
            return jnp.sum(onehot_f * f[:, None, :].astype(dtype), axis=-1)

        rows = jnp.stack([pick_field(f) for f in fields], axis=-1)    # [A, K, 7]

    counts = jnp.minimum(jnp.sum(visible, axis=1), K).astype(jnp.int32)

    # host_agent.other_agent_states keeps its previous value if nothing is
    # visible (the reference only assigns it for other_agent_count == 0 in
    # the loop, ":136-137").
    closest = jnp.where((counts > 0)[:, None], rows[:, 0, :], state.other_agent_states)

    return rows, closest, counts
