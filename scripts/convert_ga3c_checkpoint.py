"""One-time conversion: GA3C-CADRL TF1 checkpoint -> numpy .npz pytree.

Reads the frozen TF1 checkpoint shipped with the reference
(``/root/reference/.../GA3C_CADRL/checkpoints/IROS18/network_01900000``,
loaded by the reference at envs/policies/GA3C_CADRL/network.py:43-74) and
extracts (a) the forward-pass variables, (b) the input-normalization
constants baked into the graph (``Const:0``/``Const_1:0`` feeding the
``sub``/``div`` ops on X).

Usage:
    python scripts/convert_ga3c_checkpoint.py [ckpt_path] [out.npz]
"""

import os
import sys

import numpy as np

DEFAULT_CKPT = (
    "/root/reference/gym_collision_avoidance/envs/policies/GA3C_CADRL/"
    "checkpoints/IROS18/network_01900000"
)
DEFAULT_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gym_collision_avoidance_tpu", "models", "weights", "ga3c_cadrl_iros18.npz",
)

FORWARD_VARS = {
    "rnn/lstm_cell/kernel": "lstm_kernel",     # [71, 256] = [7+64, 4*64]
    "rnn/lstm_cell/bias": "lstm_bias",         # [256]
    "layer1/kernel": "layer1_kernel",          # [68, 256] = [4+64, 256]
    "layer1/bias": "layer1_bias",
    "layer2/kernel": "layer2_kernel",          # [256, 256]
    "layer2/bias": "layer2_bias",
    "fullyconnected1/kernel": "fc1_kernel",    # [256, 256]
    "fullyconnected1/bias": "fc1_bias",
    "logits_p/kernel": "logits_p_kernel",      # [256, 11]
    "logits_p/bias": "logits_p_bias",
    "logits_v/kernel": "logits_v_kernel",      # [256, 1]
    "logits_v/bias": "logits_v_bias",
}


def convert(ckpt_path: str = DEFAULT_CKPT, out_path: str = DEFAULT_OUT):
    import tensorflow.compat.v1 as tf

    tf.disable_v2_behavior()

    out = {}
    reader = tf.train.load_checkpoint(ckpt_path)
    for tf_name, our_name in FORWARD_VARS.items():
        out[our_name] = reader.get_tensor(tf_name + ":0").astype(np.float32)

    # Normalization constants live in the graph, not the checkpoint.
    g = tf.Graph()
    with g.as_default():
        tf.train.import_meta_graph(ckpt_path + ".meta", clear_devices=True)
        with tf.Session(graph=g) as sess:
            out["input_avg"] = sess.run(g.get_tensor_by_name("Const:0")).astype(np.float32)
            out["input_std"] = sess.run(g.get_tensor_by_name("Const_1:0")).astype(np.float32)

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, **out)
    print(f"wrote {out_path}: " + ", ".join(f"{k}{v.shape}" for k, v in out.items()))


if __name__ == "__main__":
    args = sys.argv[1:]
    convert(*args)
