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


@functools.lru_cache(maxsize=4)
def load_params(path: str = _WEIGHTS_PATH, dtype=jnp.float64):
    path = CHECKPOINTS.get(path, path)  # accept a checkpoint name or a path
    with np.load(path) as z:
        return {k: jnp.asarray(z[k], dtype) for k in z.files}


def forward_raw(params, x):
    """Value prediction for raw (unstandardized) agent-centric states.

    Args:
        x: [..., 31] batch.
    Returns:
        [...] raw value (pre-clip; callers apply the [-0.25, 1] clip and the
        gamma upper bound per find_states_values,
        nn_navigation_value_multi.py:2052-2100).
    """
    xn = (x - params["avg_vec"]) / params["std_vec"]
    h = jax.nn.relu(xn @ params["W0"] + params["b0"])
    h = jax.nn.relu(h @ params["W1"] + params["b1"])
    # max layer (layers_info [[1,50],[3,50]]): host 50-block passes through a
    # max over 1; the 3 other-agent 50-blocks reduce with an elementwise max.
    # Written as slice-maxes (a reshape to [., 3, 50] forces a costly layout
    # transpose on TPU; contiguous slices are free).
    host = h[..., :HOST_BLOCK]
    pooled = jnp.maximum(
        jnp.maximum(
            h[..., HOST_BLOCK:HOST_BLOCK + OTHER_BLOCK],
            h[..., HOST_BLOCK + OTHER_BLOCK:HOST_BLOCK + 2 * OTHER_BLOCK],
        ),
        h[..., HOST_BLOCK + 2 * OTHER_BLOCK:HOST_BLOCK + 3 * OTHER_BLOCK],
    )
    z = jnp.concatenate([host, pooled], axis=-1)
    z = jax.nn.relu(z @ params["W3"] + params["b3"])
    y = z @ params["W4"] + params["b4"]
    return (y * params["output_std"] + params["output_avg"])[..., 0]
