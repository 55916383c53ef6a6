"""SA-CADRL value network: batched pure-JAX forward.

Re-implements the reference's hand-rolled numpy MLP
(``neural_network_regr_multi.make_prediction`` /
``make_prediction_raw``, neural_networks/neural_network_regr_multi.py:726-820)
for the shipped 4-agent net:

  x[31] -> standardize -> Dense(200)+ReLU -> Dense(200)+ReLU
        -> block-max over the 3 other-agent 50-blocks (keep host 50) -> 100
        -> Dense(50)+ReLU -> Dense(1) -> de-standardize

Weights from ``scripts/convert_cadrl_weights.py``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_WEIGHTS_DIR = os.path.dirname(os.path.abspath(__file__))

# Both SA-CADRL value nets the reference ships
# (CADRL/pickle_files/multi/): "no_constr" is what CADRLPolicy loads by
# default (CADRLPolicy.py:23); "rotate_constr_right" is the commented
# alternative at CADRLPolicy.py:22 and activates the passing-side cost
# path (nn_navigation_value_multi.py:2420-2573) with passing_side='right'.
CHECKPOINTS = {
    "no_constr": os.path.join(_WEIGHTS_DIR, "weights", "cadrl_4agent_iter1000.npz"),
    "rotate_constr_right": os.path.join(
        _WEIGHTS_DIR, "weights", "cadrl_4agent_rotate_constr_right_iter1300.npz"
    ),
}

_WEIGHTS_PATH = CHECKPOINTS["no_constr"]

INPUT_DIM = 31
HOST_BLOCK = 50
OTHER_BLOCK = 50
NUM_OTHER_SLOTS = 3


@functools.lru_cache(maxsize=8)
def load_params(path: str = _WEIGHTS_PATH, dtype=jnp.float64, tpu_pad: bool = False):
    path = CHECKPOINTS.get(path, path)  # accept a checkpoint name or a path
    with np.load(path) as z:
        params = {k: np.asarray(z[k], np.float64) for k in z.files}
    if tpu_pad:
        params = pad_params_tpu(params)
    return {k: jnp.asarray(v, dtype) for k, v in params.items()}


# TPU-padded geometry: the legacy dims (31/200/100/50) tile the VPU/MXU
# poorly (lane width 128, sublane 8).  Zero-padding is mathematically a
# no-op (zero columns/rows contribute exact +0.0 to every dot product and
# relu(0)=0 flows through) and lands every matmul/slice on lane-aligned
# boundaries: 32 -> 256 -> 4x64-blocks -> 128 -> 64 -> 1.
PAD_IN = 32       # input 31 -> 32
PAD_H0 = 256      # first hidden 200 -> 256
PAD_BLOCK = 64    # the four 50-blocks of the second hidden -> 64 each


def _pad1(v, n, fill):
    out = np.full((n,), fill, v.dtype)
    out[: v.shape[0]] = v
    return out


def pad_params_tpu(p):
    """Zero-pad the value-net weights to lane-aligned dims (bit-identical
    outputs; see forward_raw, which dispatches on the padded shapes)."""
    dt = p["W0"].dtype
    out = {
        "avg_vec": _pad1(p["avg_vec"], PAD_IN, 0.0),
        "std_vec": _pad1(p["std_vec"], PAD_IN, 1.0),
        "b0": _pad1(p["b0"], PAD_H0, 0.0),
        "b4": p["b4"],
        "output_avg": p["output_avg"],
        "output_std": p["output_std"],
    }
    W0 = np.zeros((PAD_IN, PAD_H0), dt)
    W0[:INPUT_DIM, : p["W0"].shape[1]] = p["W0"]
    out["W0"] = W0
    # W1's OUTPUT carries the [host|o1|o2|o3] 50-block structure the max
    # layer slices; scatter each 50-block into a 64-aligned block.
    W1 = np.zeros((PAD_H0, 4 * PAD_BLOCK), dt)
    b1 = np.zeros((4 * PAD_BLOCK,), dt)
    for b in range(4):
        W1[: p["W1"].shape[0], b * PAD_BLOCK : b * PAD_BLOCK + OTHER_BLOCK] = (
            p["W1"][:, b * OTHER_BLOCK : (b + 1) * OTHER_BLOCK]
        )
        b1[b * PAD_BLOCK : b * PAD_BLOCK + OTHER_BLOCK] = (
            p["b1"][b * OTHER_BLOCK : (b + 1) * OTHER_BLOCK]
        )
    out["W1"], out["b1"] = W1, b1
    # z = [host64|pooled64]: W3's host rows stay at 0, pooled rows move to 64
    W3 = np.zeros((2 * PAD_BLOCK, PAD_BLOCK), dt)
    W3[:HOST_BLOCK, : p["W3"].shape[1]] = p["W3"][:HOST_BLOCK]
    W3[PAD_BLOCK : PAD_BLOCK + OTHER_BLOCK, : p["W3"].shape[1]] = p["W3"][HOST_BLOCK:]
    out["W3"] = W3
    out["b3"] = _pad1(p["b3"], PAD_BLOCK, 0.0)
    W4 = np.zeros((PAD_BLOCK, 1), dt)
    W4[: p["W4"].shape[0]] = p["W4"]
    out["W4"] = W4
    return out


def forward_raw(params, x):
    """Value prediction for raw (unstandardized) agent-centric states.

    Args:
        x: [..., 31] batch.
    Returns:
        [...] raw value (pre-clip; callers apply the [-0.25, 1] clip and the
        gamma upper bound per find_states_values,
        nn_navigation_value_multi.py:2052-2100).

    With TPU-padded params (load_params(tpu_pad=True)) the same math runs
    on lane-aligned dims; outputs are identical (zero padding).
    """
    padded = params["W0"].shape[0] == PAD_IN
    host_blk = other_blk = PAD_BLOCK if padded else HOST_BLOCK
    if padded:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (PAD_IN - INPUT_DIM,), x.dtype)],
            axis=-1,
        )
    xn = (x - params["avg_vec"]) / params["std_vec"]
    h = jax.nn.relu(xn @ params["W0"] + params["b0"])
    h = jax.nn.relu(h @ params["W1"] + params["b1"])
    # max layer (layers_info [[1,50],[3,50]]): host 50-block passes through a
    # max over 1; the 3 other-agent 50-blocks reduce with an elementwise max.
    # Written as slice-maxes (a reshape to [., 3, 50] forces a costly layout
    # transpose on TPU; contiguous slices are free).
    host = h[..., :host_blk]
    pooled = jnp.maximum(
        jnp.maximum(
            h[..., host_blk:host_blk + other_blk],
            h[..., host_blk + other_blk:host_blk + 2 * other_blk],
        ),
        h[..., host_blk + 2 * other_blk:host_blk + 3 * other_blk],
    )
    z = jnp.concatenate([host, pooled], axis=-1)
    z = jax.nn.relu(z @ params["W3"] + params["b3"])
    y = z @ params["W4"] + params["b4"]
    return (y * params["output_std"] + params["output_avg"])[..., 0]
