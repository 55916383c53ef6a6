"""SA-CADRL internal policy: batched one-step-lookahead over 47 candidate
actions.

Branch-free JAX port of the behavioral core of the reference's
``CADRLPolicy`` + legacy ``NN_navigation_value`` stack:

* wrapper & agent conversion  — envs/policies/CADRLPolicy.py:27-167
* candidate actions (47)      — nn_navigation_value_multi.py:561-647
* dt_forward lookahead        — :1258-1265
* other-agent propagation     — :946-1050, :1636-1700
* segment-segment collision + front-agent velocity hack — :1874-2007,
  gen_rand_testcases.py:54-88
* shaped action rewards       — :776-827
* state propagation           — :1700-1794
* agent-centric encoding      — pedData_processing_multi.py:375-471
* value lookup + upper bound  — :2052-2100
* value combination + argmax  — :1267-1295, :1403-1456

Everything is computed for all agents x all 47 actions x all 3 other-slots
and masked, so the whole policy is a few fused batched matmuls + vector ops
(TPU idiom), vmapped over ego agents.

Constants from CADRL/scripts/multi/global_var.py:5-62.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gym_collision_avoidance_tpu.core import maths
from gym_collision_avoidance_tpu.models import cadrl as cadrl_net
from gym_collision_avoidance_tpu.policies import registry

PARAMS_KEY = "cadrl"

GAMMA = 0.97
DT_NORMAL = 0.5
COLLISION_COST = -0.25
DIST_2_GOAL_THRES = 0.05
GETTING_CLOSE_RANGE = 0.2
EPS = 1e-5
DT_FORWARD_DEFAULT = 1.0   # NN_navigation_value.dt_forward (:210)
RADIUS_BUFFER = 0.0        # :211
NUM_ACTIONS = 47
NUM_SLOTS = 3              # the shipped net is a 4-agent net
TURNING_LIMIT = jnp.pi / 6.0   # nn_navigation_value_multi.py:52
# rotate_constr candidate layout: [2 default | 5 desired | 25 close | 6 turn]
NUM_ACTIONS_ROTATE = 38


def _mod_wrap(a):
    """(a + pi) % (2 pi) - pi — the legacy stack's angle wrap
    (find_angle_diff, CADRL utils)."""
    return (a + jnp.pi) % (2 * jnp.pi) - jnp.pi


def _candidate_actions(s10):
    """The 47 candidate (speed, global-heading) pairs
    (find_actions_theta, nn_navigation_value_multi.py:561-647).

    Returned as two separate [47] vectors rather than one [47, 2] array:
    a trailing size-2 axis fills 2 of 128 VPU lanes and its layout copy
    was the single largest op in the round-2 device trace (16% of the
    step).  The reference wraps the heading COLUMN after assembly
    (find_actions_theta's mod on the stacked array); wrapping each
    block's angles at the source is elementwise-identical
    (_mod_wrap(0) == 0, so the zero row needs no wrap)."""
    pref = s10[5]
    cur_speed = jnp.sqrt(s10[2] ** 2 + s10[3] ** 2)

    desired_angle = _mod_wrap(jnp.arctan2(s10[7] - s10[1], s10[6] - s10[0]))
    desired_scales = jnp.array([1.0, 0.80, 0.60, 0.40, 0.20])

    near_headings = _mod_wrap(
        s10[4] + jnp.linspace(-jnp.pi / 3.0, jnp.pi / 3.0, 10)
    )
    near_scales = jnp.array([1.0, 0.75, 0.50, 0.25])
    near_speed = pref * near_scales                               # [4]

    speeds = jnp.concatenate(
        [
            cur_speed[None],
            pref * desired_scales,
            jnp.zeros((1,)),
            jnp.repeat(near_speed, 10),
        ]
    )                                                             # [47]
    headings = jnp.concatenate(
        [
            _mod_wrap(s10[4])[None],
            jnp.full((5,), desired_angle),
            jnp.zeros((1,)),
            jnp.tile(near_headings, 4),
        ]
    )                                                             # [47]
    return speeds, headings


def _close_actions_table():
    """The 25-row close-action grid (find_close_actions, :87-110):
    [0, 0] plus speeds {1, .75, .5, .25} x 6 angles in [-pi/6, pi/6]."""
    import numpy as np

    angles = np.linspace(-np.pi / 6.0, np.pi / 6.0, 6, endpoint=True)
    speeds = np.linspace(1.0, 0.0, 4, endpoint=False)
    ag, sg = np.meshgrid(angles, speeds)
    a = np.append([0.0], ag.flatten())
    s = np.append([0.0], sg.flatten())
    return np.stack([s, a], axis=-1)                              # [25, 2]


_CLOSE_ACTIONS = _close_actions_table()


def _candidate_actions_rotate(s10):
    """The dynamically-constrained candidate set for mode='rotate_constr'
    (find_actions_theta_dynConstr, :649-722, called with dt=1.0 at :1328).

    The reference's set has data-dependent size (the default/desired blocks
    are only stacked in when within the turning limit); here every block
    occupies a static slot and a validity mask marks the conditional ones.
    Slot order matches the reference's vstack order
    [default, desired, close, turning] so first-max argmax tie-breaking is
    preserved once invalid rows are masked to -inf.

    Returns (speeds [38], headings [38], valid [38] bool) — split vectors
    for the same lane-layout reason as :func:`_candidate_actions`."""
    dtype = s10.dtype
    pref = s10[5]
    cur_heading = s10[4]
    cur_speed = jnp.sqrt(s10[2] ** 2 + s10[3] ** 2)
    angle_lim = TURNING_LIMIT                                     # dt = 1.0

    desired_heading = jnp.arctan2(s10[7] - s10[1], s10[6] - s10[0])
    desired_on = jnp.abs(_mod_wrap(desired_heading - cur_heading)) < angle_lim
    default_heading = jnp.arctan2(s10[3], s10[2])
    default_on = (
        jnp.abs(_mod_wrap(default_heading - cur_heading)) < angle_lim
    ) & (cur_speed > 0.05)

    close = jnp.asarray(_CLOSE_ACTIONS, dtype)
    turn_frac = jnp.array([1.0, 0.66, 0.33, -0.33, -0.66, -1.0], dtype)

    speeds = jnp.concatenate(
        [
            jnp.array([1.0, 0.75], dtype) * cur_speed,
            jnp.array([1.0, 0.80, 0.60, 0.40, 0.20], dtype) * pref,
            close[:, 0] * pref,
            jnp.zeros((6,), dtype),
        ]
    )                                                             # [38]
    headings = _mod_wrap(
        jnp.concatenate(
            [
                jnp.full((2,), default_heading),
                jnp.full((5,), desired_heading),
                close[:, 1] + cur_heading,
                turn_frac * TURNING_LIMIT + cur_heading,
            ]
        )
    )                                                             # [38]
    valid = jnp.concatenate(
        [
            jnp.repeat(default_on, 2),
            jnp.repeat(desired_on, 5),
            jnp.ones((25 + 6,), bool),
        ]
    )
    return speeds, headings, valid


def _update_states(s10, actions, dt, mode: str = "no_constr"):
    """Propagate the ego state under each action
    (update_states, :1700-1794; the turning-dir slot [9] is
    also updated there but nothing downstream reads it — the encoder zeroes
    it, pedData_processing_multi.py:336 — so it is skipped here).

    ``mode`` selects the next-heading rule (:1751-1777): no_constr takes the
    action heading verbatim; rotate_constr clips the heading change to the
    turning limit pref_speed / 0.5 * dt."""
    speed, heading = actions
    n = speed.shape[0]
    c = jnp.cos(heading)
    s = jnp.sin(heading)
    ones = jnp.ones((n,), s10.dtype)
    if mode == "no_constr":
        heading_next = heading
    elif mode == "rotate_constr":
        limit = s10[5] / 0.5 * dt
        heading_next = _mod_wrap(
            s10[4] + jnp.clip(_mod_wrap(heading - s10[4]), -limit, limit)
        )
    else:
        raise ValueError(f"unknown CADRL mode {mode!r}")
    # column stack (tile + scatter-update forces layout copies on TPU)
    return jnp.stack(
        [
            s10[0] + speed * c * dt,
            s10[1] + speed * s * dt,
            speed * c,
            speed * s,
            heading_next,
            s10[5] * ones,
            s10[6] * ones,
            s10[7] * ones,
            s10[8] * ones,
            s10[9] * ones,
        ],
        axis=-1,
    )


def _seg_min_dists(x1, x2, y1, y2):
    """Min distance between the moving-point segments (x1->x2[i]) and
    (y1->y2[i]) (find_dist_between_segs, gen_rand_testcases.py:54-88; the
    start distance is not part of the min)."""
    end_dist = jnp.linalg.norm(x2 - y2, axis=1)
    z_bar = (x2 - x1) - (y2 - y1)
    zz = jnp.sum(z_bar * z_bar, axis=1)
    nonzero = jnp.sqrt(zz) > 0
    t_bar = -jnp.sum((x1 - y1) * z_bar, axis=1) / jnp.where(nonzero, zz, 1.0)
    interp = (x1 + (x2 - x1) * t_bar[:, None]) - (y1 + (y2 - y1) * t_bar[:, None])
    dist_bar = jnp.linalg.norm(interp, axis=1)
    use_crit = nonzero & (t_bar > 0) & (t_bar < 1.0)
    critical = jnp.where(use_crit, dist_bar, end_dist)
    return jnp.minimum(end_dist, critical)


def _if_actions_collide(s10, actions, other_s10, other_action, dt):
    """(min_dists[47], if_collide[47]) vs one other agent
    (if_actions_collide, :1874-2007).  ``actions`` is the (speed, heading)
    vector pair."""
    speed, heading = actions
    pref = s10[5]
    other_speed = other_action[0]
    radius = s10[8] + other_s10[8] + RADIUS_BUFFER
    n = speed.shape[0]

    p_e = s10[0:2]
    p_o = other_s10[0:2]
    dist_eo = jnp.linalg.norm(p_e - p_o)
    too_far = dist_eo > (pref + other_speed) * dt + radius

    agent_vels = jnp.stack(
        [speed * jnp.cos(heading), speed * jnp.sin(heading)],
        axis=-1,
    )
    other_v = jnp.array(
        [other_action[0] * jnp.cos(other_action[1]), other_action[0] * jnp.sin(other_action[1])]
    )
    other_vels = jnp.tile(other_v, (n, 1))

    # Front-agent velocity-projection hack (:1913-1957).
    p_oa_angle = jnp.arctan2(p_o[1] - p_e[1], p_o[0] - p_e[0])
    agent_speed_angles = jnp.arctan2(agent_vels[:, 1], agent_vels[:, 0])
    other_speed_angle = jnp.arctan2(other_v[1], other_v[0])
    heading_diff = _mod_wrap(agent_speed_angles - other_speed_angle)
    heading_2_other = _mod_wrap(agent_speed_angles - p_oa_angle)
    r_close = s10[8] + other_s10[8] + GETTING_CLOSE_RANGE
    coll_angle = jnp.abs(
        jnp.arcsin(jnp.minimum(0.95, r_close / jnp.maximum(dist_eo, 1e-30)))
    )
    front = (jnp.abs(heading_2_other) < coll_angle) & (jnp.abs(heading_diff) < jnp.pi / 2.0)
    dot = jnp.sum(agent_vels * other_vels, axis=1)
    vel_norm = jnp.linalg.norm(agent_vels, axis=1)
    # Only rows with vx > EPS get normalized (reference quirk, :1946-1949).
    dot = jnp.where(agent_vels[:, 0] > EPS, dot / jnp.maximum(vel_norm, 1e-30), dot)
    other_vels = jnp.where(
        front[:, None], other_vels - dot[:, None] * agent_vels / 2.0, other_vels
    )

    horizon = jnp.minimum(1.0, dt)
    x2 = p_e + horizon * agent_vels
    y2 = p_o + horizon * other_vels
    min_dists = _seg_min_dists(p_e, x2, p_o, y2)

    if_collide = jnp.where(dist_eo < radius, True, min_dists < radius)
    min_dists = min_dists - radius

    far_min = radius + GETTING_CLOSE_RANGE + EPS
    min_dists = jnp.where(too_far, far_min, min_dists)
    if_collide = jnp.where(too_far, False, if_collide)
    return min_dists, if_collide


def _action_rewards(s10, cur_dist, min_dists):
    """Shaped per-action rewards (find_action_rewards, :776-827)."""
    d = jnp.linalg.norm(s10[0:2] - s10[6:8])
    v = s10[5]
    gcp = GAMMA ** (d / DT_NORMAL) * (1.0 - GAMMA ** (-v / DT_NORMAL))

    rewards = jnp.zeros_like(min_dists)
    rewards = jnp.where(cur_dist < GETTING_CLOSE_RANGE, gcp, rewards)
    close = (min_dists > 0) & (min_dists < GETTING_CLOSE_RANGE)
    rewards = jnp.where(close, rewards + gcp, rewards)
    rewards = jnp.where(min_dists < 0, COLLISION_COST, rewards)
    shaped = 2.0 * rewards + 5.0 * gcp * (GETTING_CLOSE_RANGE - min_dists)
    rewards = jnp.where(close, jnp.clip(shaped, COLLISION_COST + 0.01, 0.0), rewards)
    # Full collision of the *current* position overrides everything (:783-785).
    return jnp.where(cur_dist < 0, COLLISION_COST, rewards)


def _find_bad_inds(states_nn, side: str):
    """Passing-side rule violations over an agent-centric batch
    (find_bad_inds, nn_navigation_value_multi.py:2420-2573).  ``side`` is
    static ('right' or 'left'); returns the union of the oppo/same/tangent
    masks (the reference assigns the identical ``weight * penalty`` to each
    group, :887-893, so the union loses nothing)."""
    agent_vel = states_nn[:, 4:6]
    agent_speed = jnp.linalg.norm(agent_vel, axis=1)
    agent_heading = states_nn[:, 3]
    dist_2_goal = states_nn[:, 0]
    other_px = states_nn[:, 9]
    other_py = states_nn[:, 10]
    other_vel = states_nn[:, 7:9]
    other_vx = other_vel[:, 0]
    other_vy = other_vel[:, 1]
    other_speed = jnp.linalg.norm(other_vel, axis=1)
    other_heading = jnp.arctan2(other_vy, other_vx)

    rel_vel = agent_vel - other_vel
    rel_vel_angle = jnp.arctan2(rel_vel[:, 1], rel_vel[:, 0])
    rel_pos_angle = jnp.arctan2(-other_py, -other_px)
    rot_angle = _mod_wrap(rel_vel_angle - rel_pos_angle)

    base = (dist_2_goal > 1) & (other_speed > EPS) & (agent_speed > EPS)
    # Reference quirk (:2494, :2556): the tangent test overwrites
    # agent_speed with the scalar states[0, 1] (row-0 pref_speed).
    agent_speed_0 = states_nn[0, 1]
    base_tangent = (dist_2_goal > 1) & (other_speed > EPS) & (agent_speed_0 > EPS)
    other_rel_dist = jnp.sqrt(other_px**2 + other_py**2)

    if side == "right":
        same_fast = base & (agent_speed > other_speed + 0.1) & (
            (other_py > -0.5) & (other_py < 2) & (other_px > 0) & (other_px < 3)
        ) & (agent_heading < 0) & (jnp.abs(other_heading) < jnp.pi / 6.0)
        same_slow = base & (agent_speed < other_speed - 0.1) & (
            (other_py < 0) & (other_py > -2) & (other_px < 0) & (other_px > -3)
        ) & (agent_heading > 0) & (jnp.abs(other_heading) < jnp.pi / 6.0)
        oppo = base & (
            (other_py < 0) & (other_py > -2) & (other_px > 0) & (other_px < 5)
        ) & (agent_heading > EPS) & (other_heading < -5.0 * jnp.pi / 6.0)
        tangent = base_tangent & (other_px > 0) & (other_rel_dist < 3) & (
            rot_angle < 0
        ) & (jnp.abs(other_heading) > jnp.pi / 4.0) & (
            agent_speed_0 > other_speed - 0.2
        )
    elif side == "left":
        same_fast = base & (agent_speed > other_speed + 0.1) & (
            (other_py > -2) & (other_py < 0.5) & (other_px > 0) & (other_px < 3)
        ) & (agent_heading > 0) & (jnp.abs(other_heading) < jnp.pi / 6.0)
        same_slow = base & (agent_speed < other_speed - 0.1) & (
            (other_py < 2) & (other_py > 0) & (other_px < 0) & (other_px > -3)
        ) & (agent_heading > 0) & (jnp.abs(other_heading) < jnp.pi / 6.0)
        oppo = base & (
            (other_py < 2) & (other_py > 0) & (other_px > 0) & (other_px < 5)
        ) & (agent_heading < EPS) & (other_heading > 5.0 * jnp.pi / 6.0)
        tangent = base_tangent & (other_px > 0) & (other_rel_dist < 3) & (
            rot_angle > 0
        ) & (jnp.abs(other_heading) > jnp.pi / 4.0) & (
            agent_speed_0 > other_speed - 0.2
        )
    else:
        raise ValueError(f"passing side must be 'right' or 'left', got {side!r}")
    return same_fast | same_slow | oppo | tangent


# training_passing_side_weight (nn_navigation_value_multi.py:214)
PASSING_SIDE_WEIGHT = 0.5


def _passing_side_cost(
    s10, agent_next, others_s10, others_next, present, side: str
):
    """Social-norm penalty added to the 47 action rewards
    (find_passing_side_cost, nn_navigation_value_multi.py:829-894): encode
    the propagated ego states against the *closest* propagated other, find
    rule-violating actions, and charge ``weight * getting_close_penalty``.

    ``others_next`` is the already-propagated [3, 10] slot array from the
    lookahead (update_state semantics match, :857-861)."""
    dtype = s10.dtype
    # closest other by current clearance, no buffer (:846-856)
    d2o = jnp.where(
        present,
        jnp.linalg.norm(others_s10[:, 0:2] - s10[0:2], axis=1)
        - others_s10[:, 8]
        - s10[8],
        jnp.inf,
    )
    sel = (jnp.arange(NUM_SLOTS) == jnp.argmin(d2o)).astype(dtype)
    # masked sum, not a dot: tiny dot_generals lower to bf16-operand
    # convolution emitters on TPU (see PERF.md "small contractions")
    other_next = jnp.sum(sel[:, None] * others_next, axis=0)      # [10]
    # encode vs a single other in slot 0 (others list of length 1, :862-868;
    # the encoder's closest-to-slot-0 reorder is the identity here)
    others_stack = jnp.broadcast_to(other_next, (NUM_SLOTS,) + other_next.shape)
    present_one = jnp.arange(NUM_SLOTS) == 0
    states_nn = _encode(agent_next, others_stack, present_one)    # [47, 31]
    bad = _find_bad_inds(states_nn, side)

    d = jnp.linalg.norm(s10[0:2] - s10[6:8])
    v = s10[5]
    gcp = GAMMA ** (d / DT_NORMAL) * (1.0 - GAMMA ** (-v / DT_NORMAL))
    return jnp.where(bad, PASSING_SIDE_WEIGHT * gcp, jnp.zeros((), dtype))


def _encode(agent_next, others_next, others_present):
    """Agent-centric NN encoding for a batch of ego next-states vs <= 3
    other next-states (rawStates_2_agentCentricStates,
    pedData_processing_multi.py:375-471).  ``others_next`` must already be
    reordered closest-first; absent slots get block-0's first 7 entries with
    is_on=0 (:465-467 + filler :385-388)."""
    n = agent_next.shape[0]
    goal_dir = agent_next[:, 6:8] - agent_next[:, 0:2]
    dist_to_goal = jnp.clip(jnp.linalg.norm(goal_dir, axis=1), 0, 30)
    valid = dist_to_goal > EPS
    ref_prll = jnp.stack([jnp.cos(agent_next[:, 4]), jnp.sin(agent_next[:, 4])], -1)
    # Note: division by the *clipped* distance (reference quirk — for
    # dist > 30 the frame axis is not unit length).
    ref_prll = jnp.where(
        valid[:, None], goal_dir / jnp.maximum(dist_to_goal, 1e-30)[:, None], ref_prll
    )
    ref_orth = jnp.stack([-ref_prll[:, 1], ref_prll[:, 0]], -1)
    ref_angle = jnp.arctan2(ref_prll[:, 1], ref_prll[:, 0])
    heading = _mod_wrap(agent_next[:, 4] - ref_angle)
    cur_speed = jnp.linalg.norm(agent_next[:, 2:4], axis=1)
    # Assemble the 31 feature columns and stack ONCE — the earlier
    # stack-blocks / stack-slots / where / reshape / concat chain showed up
    # in the device trace as ~15% of the step in small concatenates and
    # their feeding layout copies.
    cols = [
        dist_to_goal,
        agent_next[:, 5],
        cur_speed,
        heading,
        cur_speed * jnp.cos(heading),
        cur_speed * jnp.sin(heading),
        agent_next[:, 8],
    ]                                                             # host, 7

    block_cols = []
    for i in range(NUM_SLOTS):
        o = others_next[i]
        rel = o[0:2] - agent_next[:, 0:2]
        rel_x = jnp.clip(jnp.sum(rel * ref_prll, axis=1), -8, 8)
        rel_y = jnp.clip(jnp.sum(rel * ref_orth, axis=1), -8, 8)
        ovx = jnp.sum(o[2:4] * ref_prll, axis=1)
        ovy = jnp.sum(o[2:4] * ref_orth, axis=1)
        o_r = jnp.full((n,), o[8])
        comb = agent_next[:, 8] + o_r
        d2o = jnp.clip(
            jnp.linalg.norm(agent_next[:, 0:2] - o[0:2], axis=1)
            - agent_next[:, 8] - o_r,
            -3,
            10,
        )
        is_on = jnp.where(ovx**2 + ovy**2 < EPS, 2.0, 1.0)
        block_cols.append([ovx, ovy, rel_x, rel_y, o_r, comb, d2o, is_on])

    zero = jnp.zeros((n,), agent_next.dtype)
    for i in range(NUM_SLOTS):
        on = others_present[i]
        for f in range(8):
            # absent slots read block 0's first 7 fields with is_on = 0
            absent = block_cols[0][f] if f < 7 else zero
            cols.append(jnp.where(on, block_cols[i][f], absent))
    return jnp.stack(cols, axis=-1)                               # [n, 31]


def _swap_slot0(rows, present, closest):
    """Swap slot 0 with slot ``closest`` (the encoder's closest-other
    reorder, pedData_processing_multi.py:268-277) via a one-hot permutation
    matrix — no gather."""
    slots = jnp.arange(NUM_SLOTS)
    # perm[i] = target source slot for output slot i
    perm = jnp.where(slots == 0, closest, jnp.where(slots == closest, 0, slots))
    onehot = (perm[:, None] == slots[None, :]).astype(rows.dtype)  # [3, 3]
    # masked sums, not dots (exact f32; bf16 dot operands would round)
    rows_r = jnp.sum(onehot[:, :, None] * rows[None, :, :], axis=1)
    present_r = jnp.sum(onehot * present[None, :].astype(rows.dtype), axis=1) > 0.5
    return rows_r, present_r


def _select_others(h, state, cfg):
    """The wrapper's <= 3 closest-other selection (CADRLPolicy.py:125-139):
    the reference sorts candidates ascending by (-round(d,2), p_orth) and
    takes the *last* min(3, K) — i.e. the closest agents, ordered
    farthest-of-the-selected first.  Computed as a pairwise lexicographic
    rank + one-hot contraction (no sort/gather, which scalarize on TPU).

    Returns:
        (others_s10 [3, 10], others_action [3, 2] filtered velocities,
         present [3] bool, num_present scalar)
    """
    from gym_collision_avoidance_tpu.obs.sensors import _lex_rank

    A = state.pos.shape[0]
    dtype = state.pos.dtype
    rel = state.pos - state.pos[h]
    dist_centers = maths.norm2(rel)
    d2other = dist_centers - state.radius[h] - state.radius
    # explicit 2-term mul+add, not a dot (PERF.md "small contractions")
    p_orth = rel[:, 0] * state.ref_orth[h, 0] + rel[:, 1] * state.ref_orth[h, 1]
    cand = (
        (jnp.arange(A) != h) & state.valid & (dist_centers <= cfg.sensing_horizon)
    )
    key1 = jnp.where(cand, -(jnp.round(d2other * 100.0) / 100.0), -jnp.inf)
    key2 = jnp.where(cand, p_orth, -jnp.inf)
    rank = _lex_rank((key1, key2), jnp.arange(A))                 # [A]
    k_slots = min(NUM_SLOTS, cfg.max_num_other_agents_observed)
    eligible = cand & (rank >= A - k_slots)
    num_present = jnp.sum(eligible)
    # slot of an eligible entry, compacted to the front preserving order
    slot_of = rank - (A - num_present)
    slots = jnp.arange(NUM_SLOTS)
    onehot = (
        eligible[None, :] & (slot_of[None, :] == slots[:, None])
    ).astype(dtype)                                               # [3, A]
    present = slots < num_present                                 # [3]

    fields10 = jnp.concatenate(
        [
            state.pos,
            state.vel,
            state.heading[:, None],
            state.pref_speed[:, None],
            state.goal,
            state.radius[:, None],
            state.turning_dir[:, None],
        ],
        axis=-1,
    )                                                             # [A, 10]
    # masked sums, not dots: tiny dot_generals lower to bf16-operand
    # convolution emitters on TPU (rounding real f32 values and paying
    # layout copies); mul+sum stays exact f32 and fuses on the VPU.  At
    # most one summand per slot is nonzero, so the sum is exact.
    others_s10 = jnp.sum(onehot[:, :, None] * fields10[None, :, :], axis=1)
    past_vel_sel = jnp.sum(
        onehot[:, :, None, None] * state.past_vel[None, :, :, :], axis=1
    )
    dt_past = jnp.full((NUM_SLOTS, 2), cfg.dt, dtype)
    others_action = maths.filter_vel(dt_past, past_vel_sel)       # [3, 2]
    return others_s10, others_action, present, num_present


def _cadrl_prepare(h, state, cfg):
    """Everything before the value-net call for ego agent ``h``: other
    selection, candidates, collision pruning, rewards, propagation, and the
    agent-centric encoding.  Returns (states_nn [47, 31], aux dict) so the
    NN matmul can run once over a flattened [envs x agents x 47] batch
    (tiny per-agent batched dots serialize the MXU otherwise)."""
    dtype = state.pos.dtype
    A = state.pos.shape[0]

    s10 = jnp.concatenate(
        [
            state.pos[h],
            state.vel[h],
            state.heading[h][None],
            state.pref_speed[h][None],
            state.goal[h],
            state.radius[h][None],
            state.turning_dir[h][None],
        ]
    )

    # --- select <= 3 closest others (CADRLPolicy.py:125-139), computed as a
    # pairwise lexicographic RANK + one-hot contraction (sorts and fancy
    # gathers scalarize on TPU; see obs.sensors._lex_rank / PERF.md) ---
    others_s10, others_action, present, num_present = _select_others(
        h, state, cfg
    )

    # overwrite others' velocity from their (filtered) action (:974-983)
    oc = jnp.cos(others_action[:, 1])
    os_ = jnp.sin(others_action[:, 1])
    others_s10 = others_s10.at[:, 2].set(others_action[:, 0] * oc)
    others_s10 = others_s10.at[:, 3].set(others_action[:, 0] * os_)

    # --- lookahead horizon (:1258-1265) ---
    pref = s10[5]
    dist_to_goal = jnp.linalg.norm(s10[6:8] - s10[0:2])
    dt_forward = jnp.minimum(
        jnp.maximum(DT_FORWARD_DEFAULT, 0.5 / pref), dist_to_goal / pref
    )

    if cfg.cadrl_mode == "rotate_constr":
        a_speed, a_heading, action_valid = _candidate_actions_rotate(s10)
    else:
        a_speed, a_heading = _candidate_actions(s10)              # [47] x2
        action_valid = jnp.ones((a_speed.shape[0],), bool)
    actions = (a_speed, a_heading)

    # --- collisions vs each present other (:1005-1017) ---
    def per_other(other_s10, other_act):
        return _if_actions_collide(s10, actions, other_s10, other_act, dt_forward)

    min_d_mat, if_c_mat = jax.vmap(per_other)(others_s10, others_action)  # [3,47]
    min_d_mat = jnp.where(present[:, None], min_d_mat, jnp.inf)
    if_c_mat = jnp.where(present[:, None], if_c_mat, False)
    min_dists = jnp.min(min_d_mat, axis=0)                        # [47]
    if_collide = jnp.any(if_c_mat, axis=0)

    cur_dist_vec = jnp.where(
        present,
        jnp.linalg.norm(s10[0:2] - others_s10[:, 0:2], axis=1)
        - (s10[8] + others_s10[:, 8] + RADIUS_BUFFER),
        jnp.inf,
    )
    cur_dist = jnp.min(cur_dist_vec)

    action_rewards = _action_rewards(s10, cur_dist, min_dists)

    # --- propagate ego + others one lookahead step ---
    agent_next = _update_states(s10, actions, dt_forward, cfg.cadrl_mode)
    others_next = _update_states_others(others_s10, others_action, dt_forward)

    # social-norm penalty folded into the action rewards (:1188-1223);
    # identically zero for passing_side='none' (find_bad_inds returns
    # empty index lists there), so the branch is compiled out.
    if cfg.cadrl_passing_side != "none":
        action_rewards = action_rewards + _passing_side_cost(
            s10, agent_next, others_s10, others_next, present,
            cfg.cadrl_passing_side,
        )

    d_next = jnp.linalg.norm(agent_next[:, 0:2] - agent_next[:, 6:8], axis=1)
    reached = (d_next < DIST_2_GOAL_THRES) & (min_dists > GETTING_CLOSE_RANGE)
    needs_nn = ~if_collide & ~reached

    # --- encoder reorder: closest other to slot 0, measured from the first
    # NN-queried row's next position (pedData reorder uses agent_states[0],
    # pedData_processing_multi.py:268-277, 377-379) ---
    first_sel = jnp.argmax(needs_nn & action_valid)               # 0 if none
    # one-hot contraction instead of agent_next[first_sel] (gathers
    # scalarize on TPU)
    sel_onehot = (jnp.arange(a_speed.shape[0]) == first_sel).astype(dtype)
    # masked sum, not a dot (PERF.md "small contractions")
    first_pos = jnp.sum(sel_onehot[:, None] * agent_next[:, 0:2], axis=0)  # [2]
    d_reorder = jnp.where(
        present,
        jnp.linalg.norm(others_next[:, 0:2] - first_pos, axis=1),
        jnp.inf,
    )
    closest = jnp.argmin(d_reorder)
    others_next_r, present_r = _swap_slot0(others_next, present, closest)

    states_nn = _encode(agent_next, others_next_r, present_r)     # [47, 31]
    aux = {
        "action_speed": a_speed,
        "action_heading": a_heading,
        "action_valid": action_valid,
        "action_rewards": action_rewards,
        "if_collide": if_collide,
        "reached": reached,
        "d_next": d_next,
        "dist_col": states_nn[:, 0],
        "dt_forward": dt_forward,
        "pref": pref,
        "heading_h": state.heading[h],
        "heading_ego_h": state.heading_ego_frame[h],
        "num_present": num_present,
    }
    return states_nn, aux


def _cadrl_finish(aux, nn_raw):
    """Value bounding, combination, and argmax after the net call
    (:1284-1295, 2052-2100, CADRLPolicy.py:71-81)."""
    a_speed = aux["action_speed"]
    a_heading = aux["action_heading"]
    nn_vals = jnp.clip(nn_raw, -0.25, 1.0)
    nn_vals = jnp.minimum(GAMMA ** (aux["dist_col"] / DT_NORMAL), nn_vals)

    state_values = jnp.where(
        aux["if_collide"],
        0.0,
        jnp.where(aux["reached"], GAMMA ** (aux["d_next"] / DT_NORMAL), nn_vals),
    )

    dt_vec = 0.2 * aux["dt_forward"] + 0.8 * a_speed / aux["pref"] * aux["dt_forward"]
    values = aux["action_rewards"] + GAMMA ** (
        dt_vec * aux["pref"] / DT_NORMAL
    ) * state_values

    # candidate rows that don't exist in the reference's dynamic action set
    # (rotate_constr conditional blocks) can never win
    values = jnp.where(aux["action_valid"], values, -jnp.inf)

    best = jnp.argmax(values)
    # one-hot selection instead of a_speed[best] (per-row dynamic gathers
    # scalarize on TPU), done as a masked sum, not a dot: a [47]x[47] dot
    # under vmap becomes a tiny bf16-operand contraction on TPU that
    # rounds the selected f32 action. The 1.0/0.0 mask selects exactly.
    best_onehot = (jnp.arange(a_speed.shape[0]) == best).astype(a_speed.dtype)
    best_speed = jnp.sum(best_onehot * a_speed)
    best_heading = jnp.sum(best_onehot * a_heading)

    # wrapper: heading becomes an offset from the current heading
    # (CADRLPolicy.py:78); with no visible others, head straight to goal at
    # speed 1.0 (the reference's intent at CADRLPolicy.py:80 — its literal
    # code would raise AttributeError, so the fallback can't fire there).
    action = jnp.stack(
        [best_speed, maths.wrap(best_heading - aux["heading_h"])]
    )
    dtype = action.dtype
    fallback = jnp.stack(
        [jnp.asarray(1.0, dtype), -aux["heading_ego_h"]]
    )
    return jnp.where(aux["num_present"] > 0, action, fallback)


def _cadrl_action_single(h, state, cfg, params):
    states_nn, aux = _cadrl_prepare(h, state, cfg)
    return _cadrl_finish(aux, cadrl_net.forward_raw(params, states_nn))


def _update_states_others(others_s10, others_action, dt):
    """Propagate each other agent by its action (update_state, :1636-1700;
    heading/turning-dir slots are not read downstream)."""
    c = jnp.cos(others_action[:, 1])
    s = jnp.sin(others_action[:, 1])
    return jnp.stack(
        [
            others_s10[:, 0] + others_action[:, 0] * c * dt,
            others_s10[:, 1] + others_action[:, 0] * s * dt,
            others_action[:, 0] * c,
            others_action[:, 0] * s,
            others_action[:, 1],
            others_s10[:, 5],
            others_s10[:, 6],
            others_s10[:, 7],
            others_s10[:, 8],
            others_s10[:, 9],
        ],
        axis=-1,
    )


def _cadrl_value_single(h, state, cfg, params):
    """Value of agent h's *current* state (``find_next_action_and_value`` ->
    ``find_states_values(agent_state, other_agents_state)``,
    CADRLPolicy.py:43-48, nn_navigation_value_multi.py:2052-2071): encode
    current s10 vs the <= 3 selected others (closest reordered to slot 0),
    NN lookup with the [-0.25, 1] clip and the gamma upper bound."""
    A = state.pos.shape[0]
    s10 = jnp.concatenate(
        [
            state.pos[h], state.vel[h], state.heading[h][None],
            state.pref_speed[h][None], state.goal[h], state.radius[h][None],
            state.turning_dir[h][None],
        ]
    )
    others_s10, _others_action, present, _num_present = _select_others(
        h, state, cfg
    )
    # single-state encoder reorder: closest (from current pos) to slot 0
    d_reorder = jnp.where(
        present, jnp.linalg.norm(others_s10[:, 0:2] - s10[0:2], axis=1), jnp.inf
    )
    closest = jnp.argmin(d_reorder)
    others_s10_r, present_r = _swap_slot0(others_s10, present, closest)
    state_nn = _encode(s10[None, :], others_s10_r, present_r)[0]
    val = jnp.clip(cadrl_net.forward_raw(params, state_nn[None, :])[0], -0.25, 1.0)
    return jnp.minimum(GAMMA ** (state_nn[0] / DT_NORMAL), val)


def cadrl_state_values(state, cfg, params):
    """[A] CADRL value of every agent's current state (for dataset
    collection, cf. collect_regression_dataset.py:26-30)."""
    p = params[PARAMS_KEY] if isinstance(params, dict) and PARAMS_KEY in params else params
    A = state.pos.shape[0]
    return jax.vmap(lambda h: _cadrl_value_single(h, state, cfg, p))(jnp.arange(A))


def cadrl_kernel(state, cfg, params):
    if params is None or PARAMS_KEY not in params:
        raise ValueError(
            "CADRL policy requires params['cadrl'] "
            "(use models.cadrl.load_params())"
        )
    p = params[PARAMS_KEY]
    A = state.pos.shape[0]
    return jax.vmap(lambda h: _cadrl_action_single(h, state, cfg, p))(
        jnp.arange(A)
    )


def cadrl_kernel_batched(states, cfg, params):
    """Batched-env fast path: identical math to vmapping :func:`cadrl_kernel`
    over envs, but the value net runs ONCE over the flattened
    [E x A x 47, 31] batch instead of E*A tiny batched matmuls."""
    if params is None or PARAMS_KEY not in params:
        raise ValueError("CADRL policy requires params['cadrl']")
    p = params[PARAMS_KEY]
    E, A = states.pos.shape[:2]

    def prep_env(state):
        return jax.vmap(lambda h: _cadrl_prepare(h, state, cfg))(jnp.arange(A))

    states_nn, aux = jax.vmap(prep_env)(states)          # [E, A, 47, 31]
    # no reshape: forward_raw contracts the last dim, and handing XLA the
    # 4-D tensor (one logical [E*A*47, 31] matmul) lets it pick a single
    # layout instead of materializing transposed copies around an explicit
    # reshape (profiled at ~30% of the CADRL step).
    nn_raw = cadrl_net.forward_raw(p, states_nn)         # [E, A, 47]
    return jax.vmap(jax.vmap(_cadrl_finish))(aux, nn_raw)


registry.register_internal(registry.CADRL, cadrl_kernel)
