"""DRL-Long (Long et al. 2018) CNN policy: pure-JAX forward.

The reference wraps a PyTorch ``CNNPolicy`` from its DRL_Long submodule
(``envs/policies/DRLLongPolicy.py:14, 46``; the public
``Acmece/rl-collision-avoidance`` implementation): a 1-D CNN over a 3-deep
laserscan stack plus local goal and velocity, producing a continuous
[v, omega] action.

NOTE: the reference's checkout ships an *empty* DRL_Long submodule (no
``stage2.pth``), and flags the policy "not fully working"
(DRLLongPolicy.py:26).  We therefore implement the architecture with (a) a
converter for a user-supplied torch state_dict and (b) seeded random init
for smoke testing; behavior cannot be golden-tested without the weights.

Architecture (CNNPolicy in the public repo):
    scan [B, 3, L] -> Conv1d(3->32, k5, s2, p1) + ReLU
                   -> Conv1d(32->32, k3, s2, p1) + ReLU
                   -> flatten -> Dense(256) + ReLU
    concat([fc_scan, goal(2), speed(2)]) -> Dense(128) + ReLU
    actor mean = [sigmoid(vx_head), tanh(vw_head)]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

FRAMES = 3


def conv_out_len(L, k, s, p):
    return (L + 2 * p - k) // s + 1


def init_params(laserscan_length: int = 512, seed: int = 0, dtype=jnp.float32):
    """Seeded random parameters (He init), matching the layer shapes."""
    rng = np.random.RandomState(seed)
    L1 = conv_out_len(laserscan_length, 5, 2, 1)
    L2 = conv_out_len(L1, 3, 2, 1)
    flat = 32 * L2

    def he(shape, fan_in):
        return (rng.randn(*shape) * np.sqrt(2.0 / fan_in)).astype(np.float32)

    p = {
        "conv1_w": he((32, FRAMES, 5), FRAMES * 5),
        "conv1_b": np.zeros(32, np.float32),
        "conv2_w": he((32, 32, 3), 32 * 3),
        "conv2_b": np.zeros(32, np.float32),
        "fc1_w": he((flat, 256), flat),
        "fc1_b": np.zeros(256, np.float32),
        "fc2_w": he((256 + 4, 128), 260),
        "fc2_b": np.zeros(128, np.float32),
        "actor1_w": he((128, 1), 128),
        "actor1_b": np.zeros(1, np.float32),
        "actor2_w": he((128, 1), 128),
        "actor2_b": np.zeros(1, np.float32),
    }
    return {k: jnp.asarray(v, dtype) for k, v in p.items()}


def convert_torch_state_dict(state_dict) -> dict:
    """Map the public repo's CNNPolicy state_dict onto our param names."""
    m = {
        "act_fea_cv1.weight": "conv1_w", "act_fea_cv1.bias": "conv1_b",
        "act_fea_cv2.weight": "conv2_w", "act_fea_cv2.bias": "conv2_b",
        "act_fc1.weight": "fc1_w", "act_fc1.bias": "fc1_b",
        "act_fc2.weight": "fc2_w", "act_fc2.bias": "fc2_b",
        "actor1.weight": "actor1_w", "actor1.bias": "actor1_b",
        "actor2.weight": "actor2_w", "actor2.bias": "actor2_b",
    }
    out = {}
    for tk, ok in m.items():
        if tk not in state_dict:
            continue
        w = np.asarray(state_dict[tk])
        if ok.endswith("_w") and w.ndim == 2:
            w = w.T  # torch Linear stores [out, in]
        out[ok] = jnp.asarray(w, jnp.float32)
    return out


def init_actor_critic_params(laserscan_length: int = 512, seed: int = 0,
                             dtype=jnp.float32):
    """Trainable DRL-Long-architecture actor-critic (round 5).

    The reference ships this policy BROKEN (empty submodule, no
    checkpoint, "not fully working" — DRLLongPolicy.py:26); here the same
    CNN trunk gets a critic head + Gaussian log-std so
    ``train/ppo.py --arch drl_long`` can train a working laserscan policy
    from scratch on-device.  Actor heads and trunk are exactly
    :func:`init_params`' shapes, so a user-supplied torch checkpoint
    (convert_torch_state_dict) can warm-start the actor.
    """
    rng = np.random.RandomState(seed + 1)
    p = dict(init_params(laserscan_length, seed, dtype))
    # small-scale policy/value heads, as in the MLP family
    # (train/ppo.init_actor_critic): the initial policy sits near the
    # sigmoid/tanh midpoints with near-constant value, keeping early PPO
    # ratios tame — measured necessary for this trunk (He-scale heads
    # plateaued for 30+ iterations)
    p["actor1_w"] = p["actor1_w"] * 1e-2
    p["actor2_w"] = p["actor2_w"] * 1e-2
    p["critic_w"] = jnp.asarray(
        rng.randn(128, 1).astype(np.float32) * np.sqrt(2.0 / 128) * 1e-1,
        dtype,
    )
    p["critic_b"] = jnp.zeros((1,), dtype)
    # match the MLP family's init (train/ppo.init_actor_critic)
    p["log_std"] = jnp.full((2,), -1.2, dtype)
    return p


def forward_actor_critic(params, scan_stack, goal, speed):
    """(mean [B, 2] in [0, 1]^2, log_std [B, 2], value [B]) for training.

    The trunk and actor heads are the reference architecture
    (:func:`forward`); the omega head's tanh output is remapped
    (w+1)/2 so the mean lives in the LearningPolicy action box
    ([0, 1]^2: speed fraction, heading fraction —
    envs/policies/LearningPolicy.py:13) and the whole PPO Gaussian
    machinery is shared with the MLP family.
    """
    dtype = params["conv1_w"].dtype
    scan_stack = scan_stack.astype(dtype)
    goal = goal.astype(dtype)
    speed = speed.astype(dtype)
    h = jax.nn.relu(_conv1d(scan_stack, params["conv1_w"], params["conv1_b"], 2, 1))
    h = jax.nn.relu(_conv1d(h, params["conv2_w"], params["conv2_b"], 2, 1))
    h = h.reshape(h.shape[0], -1)
    h = jax.nn.relu(h @ params["fc1_w"] + params["fc1_b"])
    z = jnp.concatenate([h, goal, speed], axis=-1)
    z = jax.nn.relu(z @ params["fc2_w"] + params["fc2_b"])
    v = jax.nn.sigmoid(z @ params["actor1_w"] + params["actor1_b"])
    w = jnp.tanh(z @ params["actor2_w"] + params["actor2_b"])
    mean = jnp.concatenate([v, (w + 1.0) * 0.5], axis=-1)
    value = (z @ params["critic_w"] + params["critic_b"])[:, 0]
    # same clip discipline as the MLP family (train/ppo.actor_critic)
    log_std = jnp.clip(params["log_std"], -4.0, 0.0)
    log_std = jnp.broadcast_to(log_std, mean.shape)
    return mean, log_std, value


def _conv1d(x, w, b, stride, padding):
    # x [B, C, L]; w [O, C, K]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y + b[None, :, None]


def forward(params, scan_stack, goal, speed):
    """Mean action for a batch.

    Args:
        scan_stack: [B, 3, L] normalized scans (scan/6 - 0.5), oldest frame
            first (the reference's deque order, DRLLongPolicy.py:81-87).
        goal: [B, 2] goal in the body frame.
        speed: [B, 2] velocity.

    Returns:
        [B, 2] mean action: v in [0, 1] (sigmoid), omega in [-1, 1] (tanh).
    """
    scan_stack = scan_stack.astype(params["conv1_w"].dtype)
    goal = goal.astype(scan_stack.dtype)
    speed = speed.astype(scan_stack.dtype)
    h = jax.nn.relu(_conv1d(scan_stack, params["conv1_w"], params["conv1_b"], 2, 1))
    h = jax.nn.relu(_conv1d(h, params["conv2_w"], params["conv2_b"], 2, 1))
    h = h.reshape(h.shape[0], -1)
    h = jax.nn.relu(h @ params["fc1_w"] + params["fc1_b"])
    z = jnp.concatenate([h, goal, speed], axis=-1)
    z = jax.nn.relu(z @ params["fc2_w"] + params["fc2_b"])
    v = jax.nn.sigmoid(z @ params["actor1_w"] + params["actor1_b"])
    w = jnp.tanh(z @ params["actor2_w"] + params["actor2_b"])
    return jnp.concatenate([v, w], axis=-1)
