"""One-time conversion: SA-CADRL pickled numpy value net -> .npz pytree.

Source pickle: the reference's
``CADRL/pickle_files/multi/no_constr_none/RL_selfplay/4_agents_policy_iter_1000.p``
(loaded by ``CADRLPolicy.__init__`` via ``load_NN_navigation_value``,
envs/policies/CADRLPolicy.py:22-25, neural_network_regr_multi.py:79-115).

Architecture (decoded from layers_info/layers_type):
  input 31 = [1x7 host, 3x8 others]
  L0 conn (31->200=50+3x50) + ReLU
  L1 conn (200->200) + ReLU
  L2 max: block-max over the 3 other-agent 50-blocks -> 100
  L3 conn (100->50) + ReLU
  L4 conn (50->1), linear
with input standardization (avg/std) and output de-standardization.
"""

import os
import pickle
import sys

import numpy as np

DEFAULT_PICKLE = (
    "/root/reference/gym_collision_avoidance/envs/policies/CADRL/pickle_files/"
    "multi/no_constr_none/RL_selfplay/4_agents_policy_iter_1000.p"
)
DEFAULT_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gym_collision_avoidance_tpu", "models", "weights", "cadrl_4agent_iter1000.npz",
)


def convert(pickle_path: str = DEFAULT_PICKLE, out_path: str = DEFAULT_OUT):
    with open(pickle_path, "rb") as f:
        nn_list = pickle.load(f, encoding="latin1")
    W, b = nn_list[0], nn_list[1]
    layers_type = nn_list[7]
    assert layers_type == ["conn", "conn", "max", "conn", "conn"], layers_type
    out = {
        "W0": W[0], "b0": b[0][0],
        "W1": W[1], "b1": b[1][0],
        # W[2]/b[2] are empty placeholders for the max layer
        "W3": W[3], "b3": b[3][0],
        "W4": W[4], "b4": b[4][0],
        "avg_vec": nn_list[2],
        "std_vec": nn_list[3],
        "output_avg": nn_list[4],
        "output_std": nn_list[5],
    }
    out = {k: np.asarray(v, np.float64) for k, v in out.items()}
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, **out)
    print(f"wrote {out_path}: " + ", ".join(f"{k}{v.shape}" for k, v in out.items()))


if __name__ == "__main__":
    convert(*sys.argv[1:])
