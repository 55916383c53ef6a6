"""GA3C-CADRL policy network: batched pure-JAX forward pass.

Re-implements the reference's frozen TF1 graph (imported at
``envs/policies/GA3C_CADRL/network.py:43-74``; architecture excavated from
``checkpoints/IROS18/network_01900000.meta``):

    X [B, 1 + 4 + MAX_OTHER*7]
      -> (X - avg) / std                       (baked-in normalization)
      -> seq_len = int(X_norm[:, 0])           (num_other_agents; avg=0 std=1)
      -> host = X_norm[:, 1:5]                 (dist_to_goal, heading_ego,
                                                pref_speed, radius)
      -> others = X_norm[:, 5:].reshape(B, MAX_OTHER, 7)
      -> dynamic_rnn(LSTMCell(64), others, sequence_length=seq_len).state.h
      -> concat([host, h]) -> 3x Dense(256)+ReLU -> logits_p[11] / logits_v[1]
      -> softmax / squeeze

The LSTM is an ``lax.scan`` over the (<= 19-step) other-agents axis with
copy-through masking at t >= seq_len, replicating ``tf.nn.dynamic_rnn``'s
sequence_length semantics.  Weights come from
``scripts/convert_ga3c_checkpoint.py``.
"""

from __future__ import annotations

import functools
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

HIDDEN = 64

# Compute the LSTM's input-side gate GEMM per unrolled step instead of
# precomputing the whole [B, T, 4H] x_gates tensor when the sequence is
# at least this long (see _trunk_raw; round-5 ga3c40 trace/A-B).  Short
# serving sequences (T <= 3) keep the batched precompute, which measured
# faster there (round 2).
_LAZY_X_MIN_T = 8
NUM_ACTIONS = 11

_WEIGHTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "weights")

# All three GA3C-CADRL checkpoints the reference ships
# (envs/policies/GA3C_CADRL/checkpoints/): same architecture, different
# training runs.  "iros18" is the published GA3C-CADRL-10 net
# (env_utils.py:464-473); "20190727_015942" is the commented
# GA3C-CADRL-4-LSTM registry entry (env_utils.py:475-480);
# "20190727_192048" ships unnamed alongside it.
CHECKPOINTS = {
    "iros18": os.path.join(_WEIGHTS_DIR, "ga3c_cadrl_iros18.npz"),
    "20190727_015942": os.path.join(_WEIGHTS_DIR, "ga3c_cadrl_20190727_015942.npz"),
    "20190727_192048": os.path.join(_WEIGHTS_DIR, "ga3c_cadrl_20190727_192048.npz"),
    # NOT from the reference: trained from scratch by this repo's
    # on-device PPO trainer (scripts/train_ppo.py --arch ga3c --self-play
    # --agents 2 --shaping 0.1, 600 iters).  100.0% success / 0 collisions
    # on the full 2-agent 500-case frozen suite (RESULTS.md).
    "ppo_selfplay_2agent": os.path.join(_WEIGHTS_DIR, "ppo_selfplay_2agent.npz"),
    # Curriculum continuation of the net above: two further 600-iter
    # stages of 4-agent self-play (29.5M total env-steps, ~2.5 h of CPU).
    # 99.0 / 96.0 / 95.8 %% success at 2/3/4 agents on the full frozen
    # suites — above RVO on every tier (RESULTS.md run F).  Sorting
    # convention: closest_first (the trainer's env default).
    "ppo_selfplay_4agent_curr": os.path.join(
        _WEIGHTS_DIR, "ppo_selfplay_4agent_curr.npz"),
    # Final curriculum stage (2ag -> 4ag x2 -> 6ag; ~3.5 h of CPU total):
    # 99.4/98.4/98.8/98.6/96.6/96.8/94.2 %% success at 2..10 agents —
    # above RVO at EVERY density and within ~2 points of the IROS18
    # 10-agent net at 10 agents, despite seeing only K=3 others
    # (RESULTS.md run G).  closest_first sorting.
    "ppo_selfplay_6agent_curr": os.path.join(
        _WEIGHTS_DIR, "ppo_selfplay_6agent_curr.npz"),
    # Flagship: 5-stage curriculum (2ag -> 4ag x2 -> 6ag -> 10ag; ~4.5 h
    # of CPU total, ~41M env-steps).  98.8/99.6/99.8/98.8/98.0/96.8/95.8
    # %% success at 2/3/4/5/6/8/10 agents — ABOVE the IROS18 10-agent
    # checkpoint at 4 agents (99.8 vs 99.2), within ~1 point of it
    # everywhere else (incl. 95.8 vs 96.0 at its own 10-agent density),
    # and above RVO at every tier, with only K=3 visible others
    # (RESULTS.md run H).  closest_first sorting.
    "ppo_selfplay_10agent_curr": os.path.join(
        _WEIGHTS_DIR, "ppo_selfplay_10agent_curr.npz"),
    # The same 5-stage curriculum re-trained END-TO-END ON A TPU v5e CHIP
    # by scripts/train_curriculum.sh (49M env-steps in ~8 min wall vs
    # ~4.5 h CPU).  99.0/97.8/98.0/96.4/97.2/92.4/90.6 %% suite success
    # at 2/3/4/5/6/8/10 agents — above RVO/ORCA at every density
    # (RESULTS.md "TPU-trained curriculum").
    "ppo_selfplay_10agent_tpu": os.path.join(
        _WEIGHTS_DIR, "ppo_selfplay_10agent_tpu.npz"),
}

_WEIGHTS_PATH = CHECKPOINTS["iros18"]


@functools.lru_cache(maxsize=8)
def load_params(path: str = _WEIGHTS_PATH, dtype=jnp.float32) -> Dict[str, jax.Array]:
    """Load the converted checkpoint as a dict-of-arrays pytree.

    ``dtype=jnp.bfloat16`` gives the TPU fast path (~2x at MXU peak): the
    matmul weights are bf16 while the input-normalization constants stay
    float32 (they span 3 orders of magnitude; bf16 there would corrupt the
    obs). TPU bf16 matmuls accumulate in f32, so the discrete argmax
    matches f32 on >99%% of states.
    """
    path = CHECKPOINTS.get(path, path)  # accept a checkpoint name or a path
    keep_f32 = ("input_avg", "input_std")
    with np.load(path) as z:
        return {
            k: jnp.asarray(z[k], jnp.float32 if k in keep_f32 else dtype)
            for k in z.files
        }


def lstm_cell(params, x_t, c, h):
    """One TF1 ``BasicLSTMCell``/``LSTMCell`` step (forget_bias=1.0).

    TF gate order along the 4H axis is [i, j, f, o]:
        gates = [x, h] @ kernel + bias
        c' = c * sigmoid(f + 1.0) + sigmoid(i) * tanh(j)
        h' = tanh(c') * sigmoid(o)
    """
    gates = jnp.concatenate([x_t, h], axis=-1) @ params["lstm_kernel"] + params["lstm_bias"]
    i, j, f, o = jnp.split(gates, 4, axis=-1)
    new_c = c * jax.nn.sigmoid(f + 1.0) + jax.nn.sigmoid(i) * jnp.tanh(j)
    new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
    return new_c, new_h


def forward(params, x, max_seq_len: int | None = None):
    """Policy/value forward for a raw (unnormalized) obs batch.

    Args:
        params: from :func:`load_params`.
        x: [B, D] raw obs vectors in the network's layout
           [num_other_agents, dist_to_goal, heading_ego_frame, pref_speed,
           radius, (MAX_OTHER x 7 other-agent tuples)].  D is padded/cropped
           to the checkpoint width (crop_x semantics, network.py:24-35) by
           :func:`crop_to_width`.

    Args (cont.):
        max_seq_len: static cap on the LSTM scan length.  When the caller
            knows at most N other agents can be visible (N = num agents in
            the env minus 1), slots beyond N are all-zero and skipped by the
            copy-through anyway, so truncating the scan is exact — and turns
            a 19-step serial scan into an (A-1)-step one.

    Returns:
        (probs [B, 11], value [B])
    """
    width = params["input_avg"].shape[0]
    x = crop_to_width(x, width)
    xn = (x - params["input_avg"]) / params["input_std"]
    xn = xn.astype(params["lstm_kernel"].dtype)  # bf16 fast path if loaded so

    B = xn.shape[0]
    max_other = (width - 5) // 7
    T = max_other if max_seq_len is None else min(max_other, max_seq_len)
    seq_len = xn[:, 0].astype(jnp.int32)                       # [B]
    host = xn[:, 1:5]                                          # [B, 4]
    others = xn[:, 5 : 5 + T * 7].reshape(B, T, 7)             # [B, T, 7]
    return _trunk(params, seq_len, host, others)


def forward_parts(params, scalars, others, max_seq_len: int | None = None,
                  sensor_slots: int | None = None):
    """Structured-input forward, bit-identical to :func:`forward` on the
    equivalent flat vector, for callers that hold the obs as
    ``[B, 5]`` scalars + ``[B, K, 7]`` other-agent tuples (the step's
    ``sensed_others`` cache).  Skips the flat round trip entirely — the
    flat path flattens [B, K, 7] -> [B, 133], concatenates, normalizes,
    then reshapes straight back to [B, K, 7], and the flatten forces a
    layout copy of the sensor's einsum output on TPU.

    ``sensor_slots``: the caller's full sensor slot count when ``others``
    arrives ALREADY SLICED to its first K <= sensor_slots rows (the
    serving fast path: slicing before the normalize/relayout avoids
    moving the 16 padding rows of a 19-slot sensor through HBM when the
    LSTM only consumes A-1 rows — output-identical because truncated
    slots are dynamic_rnn copy-through).  Defaults to K (unsliced).

    Only valid when 5 + sensor_slots*7 equals the checkpoint input width
    (no crop/pad needed); callers fall back to :func:`forward` otherwise.
    """
    width = params["input_avg"].shape[0]
    B, K = others.shape[0], others.shape[1]
    assert 5 + 7 * (K if sensor_slots is None else sensor_slots) == width, (
        K, sensor_slots, width)
    avg_s = params["input_avg"][:5]
    std_s = params["input_std"][:5]
    avg_o = params["input_avg"][5:].reshape(-1, 7)[:K]
    std_o = params["input_std"][5:].reshape(-1, 7)[:K]
    dtype = params["lstm_kernel"].dtype
    sn = ((scalars - avg_s) / std_s).astype(dtype)             # [B, 5]
    on = ((others - avg_o) / std_o).astype(dtype)              # [B, K, 7]
    T = K if max_seq_len is None else min(K, max_seq_len)
    seq_len = sn[:, 0].astype(jnp.int32)
    return _trunk(params, seq_len, sn[:, 1:5], on[:, :T])


def _trunk(params, seq_len, host, others):
    """Shared LSTM + dense trunk -> (probs, value); see :func:`_trunk_raw`."""
    logits_p, value = _trunk_raw(params, seq_len, host, others)
    probs = jax.nn.softmax(logits_p, axis=-1)
    return probs, value


def _trunk_raw(params, seq_len, host, others):
    """Shared LSTM + dense trunk: ``others`` is [B, T, 7] normalized.
    Returns raw ``(logits_p [B, 11], value [B])`` (pre-softmax — the
    numerically safe form for training losses)."""
    B, T = others.shape[0], others.shape[1]
    xn_dtype = others.dtype

    k_x = params["lstm_kernel"][:7]                            # [7, 4H]
    k_h = params["lstm_kernel"][7:]                            # [H, 4H]
    lazy_x = T >= _LAZY_X_MIN_T
    if lazy_x:
        # Long-sequence regime (ga3c40's 19 slots): precomputing
        # x_gates materializes a [B, T, 4H] tensor — the round-5 ga3c40
        # trace had that single fusion at 26% of device time (17.8 ms
        # per 64 steps at B=10240).  Computing each step's
        # [B, 7] @ [7, 4H] inside the unrolled scan body keeps the same
        # per-row dot (bit-identical: identical contraction over the
        # same 7 values) and never materializes the big tensor.
        x_gates = None
    else:
        # Short-sequence regime (T <= 3 serving configs): one batched
        # matmul for all timesteps measured FASTER than per-step dots
        # (the original round-2 choice); kept below the threshold.
        x_gates = others @ k_x + params["lstm_bias"]           # [B, T, 4H]

    def scan_body(carry, inp):
        c, h = carry
        xg_t, t = inp
        if x_gates is None:
            xg_t = xg_t @ k_x + params["lstm_bias"]            # [B, 4H]
        gates = xg_t + h @ k_h
        i, j, f, o = jnp.split(gates, 4, axis=-1)
        new_c = c * jax.nn.sigmoid(f + 1.0) + jax.nn.sigmoid(i) * jnp.tanh(j)
        new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
        # dynamic_rnn copy-through for t >= sequence_length.
        keep = (t < seq_len)[:, None]
        c = jnp.where(keep, new_c, c)
        h = jnp.where(keep, new_h, h)
        return (c, h), None

    # Derive the zero init from the (possibly sharded) input rather than a
    # fresh constant: under shard_map the carry must share the input's
    # varying-axes type or the scan rejects it (zero cost — XLA folds the
    # 0-multiply into the zero constant).  T == 0 (single-agent training
    # envs: no other-agent slots at all) short-circuits to the zero state,
    # matching dynamic_rnn over an empty sequence.
    zero = (
        jnp.zeros((B, HIDDEN), xn_dtype)
        + 0.0 * host[:, :1].astype(xn_dtype)
    )
    init = (zero, zero)
    if T == 0:
        c, h = init
    else:
        ts = jnp.arange(T)
        # unroll: T is small and static (<= K-1 <= 19); rolled, each scan
        # step dynamic-slices x_gates into a fresh [1, B, 4H] scratch copy
        # (~28% of the serving step in the round-3 trace) — unrolled, the
        # slices are static and fuse into the gate arithmetic.
        xs = others.swapaxes(0, 1) if x_gates is None \
            else x_gates.swapaxes(0, 1)
        (c, h), _ = jax.lax.scan(
            scan_body, init, (xs, ts), unroll=True
        )

    z = jnp.concatenate([host, h], axis=-1)                    # [B, 68]
    z = jax.nn.relu(z @ params["layer1_kernel"] + params["layer1_bias"])
    z = jax.nn.relu(z @ params["layer2_kernel"] + params["layer2_bias"])
    z = jax.nn.relu(z @ params["fc1_kernel"] + params["fc1_bias"])
    logits_p = z @ params["logits_p_kernel"] + params["logits_p_bias"]
    value = (z @ params["logits_v_kernel"] + params["logits_v_bias"])[:, 0]
    return logits_p, value


def forward_parts_logits(params, scalars, others, max_seq_len: int | None = None):
    """Structured-input forward returning raw ``(logits_p, value)`` —
    the training-loss form of :func:`forward_parts` (identical trunk)."""
    width = params["input_avg"].shape[0]
    K = others.shape[1]
    assert 5 + K * 7 == width, (K, width)
    avg_s = params["input_avg"][:5]
    std_s = params["input_std"][:5]
    avg_o = params["input_avg"][5:].reshape(K, 7)
    std_o = params["input_std"][5:].reshape(K, 7)
    dtype = params["lstm_kernel"].dtype
    sn = ((scalars - avg_s) / std_s).astype(dtype)
    on = ((others - avg_o) / std_o).astype(dtype)
    T = K if max_seq_len is None else min(K, max_seq_len)
    seq_len = sn[:, 0].astype(jnp.int32)
    return _trunk_raw(params, seq_len, sn[:, 1:5], on[:, :T])


def init_params(rng, max_other: int, dtype=jnp.float32) -> Dict[str, jax.Array]:
    """Fresh trainable parameters with the exact checkpoint architecture
    (LSTMCell(64) over [7]-tuples + 3x Dense(256) + 11/1 heads), for
    training the reference's own GA3C-CADRL net on-device (the reference
    trained it externally with GA3C; ga3c/GA3C/NetworkVP*.py).

    The input-normalization constants are built from the declarative obs
    statistics (obs/spec.NORM_STATS — the same semantics the shipped
    checkpoints bake in), with slot 0 kept at (0, 1): the net reads
    ``num_other_agents`` raw as the LSTM sequence length.
    """
    from gym_collision_avoidance_tpu.obs import spec as obs_spec

    width = 5 + 7 * max_other
    om, osd = obs_spec.NORM_STATS["other_agents_states"]
    # vector layout: [num_other, dist_to_goal, heading_ego, pref_speed,
    # radius, (max_other x 7)]
    avg = np.concatenate(
        [np.array([0.0, 0.0, 0.0, 1.0, 0.5]), np.tile(om, max_other)]
    ).astype(np.float32)
    std = np.concatenate(
        [np.array([1.0, 5.0, 3.14, 1.0, 1.0]), np.tile(osd, max_other)]
    ).astype(np.float32)

    ks = jax.random.split(rng, 6)

    def glorot(key, shape):
        s = (6.0 / (shape[0] + shape[1])) ** 0.5
        return jax.random.uniform(key, shape, jnp.float32, -s, s).astype(dtype)

    H4 = 4 * HIDDEN
    return {
        "input_avg": jnp.asarray(avg),
        "input_std": jnp.asarray(std),
        "lstm_kernel": glorot(ks[0], (7 + HIDDEN, H4)),
        "lstm_bias": jnp.zeros((H4,), dtype),
        "layer1_kernel": glorot(ks[1], (4 + HIDDEN, 256)),
        "layer1_bias": jnp.zeros((256,), dtype),
        "layer2_kernel": glorot(ks[2], (256, 256)),
        "layer2_bias": jnp.zeros((256,), dtype),
        "fc1_kernel": glorot(ks[3], (256, 256)),
        "fc1_bias": jnp.zeros((256,), dtype),
        # small-scale heads: near-uniform initial policy, near-zero value
        "logits_p_kernel": glorot(ks[4], (256, NUM_ACTIONS)) * 1e-2,
        "logits_p_bias": jnp.zeros((NUM_ACTIONS,), dtype),
        "logits_v_kernel": glorot(ks[5], (256, 1)) * 1e-2,
        "logits_v_bias": jnp.zeros((1,), dtype),
    }


def crop_to_width(x, width: int):
    """Zero-pad or crop the trailing dim to the checkpoint's input width
    (mirrors ``NetworkVPCore.crop_x``, network.py:24-35)."""
    d = x.shape[-1]
    if d > width:
        return x[..., :width]
    if d < width:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, width - d)]
        return jnp.pad(x, pad)
    return x
