"""DRL-Long policy: architecture smoke tests (no shipped checkpoint — the
reference's DRL_Long submodule is empty and the policy is flagged
"not fully working", DRLLongPolicy.py:26)."""

import numpy as np
import jax.numpy as jnp

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.core.state import init_state
from gym_collision_avoidance_tpu.maps import grid as map_grid
from gym_collision_avoidance_tpu.models import drl_long as net
from gym_collision_avoidance_tpu.policies import drl_long as pol
from gym_collision_avoidance_tpu.env.step import env_reset, env_step


def test_forward_shapes_and_bounds():
    p = net.init_params(512, seed=0)
    scans = jnp.zeros((5, 3, 512))
    goal = jnp.ones((5, 2))
    speed = jnp.zeros((5, 2))
    mean = net.forward(p, scans, goal, speed)
    assert mean.shape == (5, 2)
    assert (np.asarray(mean[:, 0]) >= 0).all() and (np.asarray(mean[:, 0]) <= 1).all()
    assert (np.abs(np.asarray(mean[:, 1])) <= 1).all()


def test_torch_state_dict_conversion_matches_torch():
    torch = __import__("torch")
    nn = torch.nn
    L = 512

    class CNNPolicy(nn.Module):
        def __init__(self):
            super().__init__()
            self.act_fea_cv1 = nn.Conv1d(3, 32, 5, 2, 1)
            self.act_fea_cv2 = nn.Conv1d(32, 32, 3, 2, 1)
            flat = 32 * net.conv_out_len(net.conv_out_len(L, 5, 2, 1), 3, 2, 1)
            self.act_fc1 = nn.Linear(flat, 256)
            self.act_fc2 = nn.Linear(256 + 4, 128)
            self.actor1 = nn.Linear(128, 1)
            self.actor2 = nn.Linear(128, 1)

        def forward(self, scan, goal, speed):
            h = torch.relu(self.act_fea_cv1(scan))
            h = torch.relu(self.act_fea_cv2(h))
            h = h.reshape(h.shape[0], -1)
            h = torch.relu(self.act_fc1(h))
            z = torch.cat([h, goal, speed], dim=-1)
            z = torch.relu(self.act_fc2(z))
            return torch.cat(
                [torch.sigmoid(self.actor1(z)), torch.tanh(self.actor2(z))], -1
            )

    torch.manual_seed(0)
    tp = CNNPolicy()
    scan = torch.randn(4, 3, L)
    goal = torch.randn(4, 2)
    speed = torch.randn(4, 2)
    with torch.no_grad():
        ref = tp(scan, goal, speed).numpy()

    params = net.convert_torch_state_dict(tp.state_dict())
    ours = np.asarray(
        net.forward(params, jnp.asarray(scan.numpy()), jnp.asarray(goal.numpy()),
                    jnp.asarray(speed.numpy()))
    )
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_env_step_with_drl_long():
    cfg = EnvConfig(dtype="float32", use_static_map=True,
                    map_x_width=10.0, map_y_width=10.0)
    static = jnp.asarray(map_grid.load_static_map(cfg, None))
    state = init_state(cfg, pos=np.array([[-3.0, 0.0], [3.0, 0.0]]),
                       goal=np.array([[3.0, 0.0], [-3.0, 0.0]]),
                       radius=np.array([0.3, 0.3]),
                       pref_speed=np.array([1.0, 1.0]),
                       policy_id=np.full(2, pol.DRL_LONG, np.int32))
    params = {"drl_long": net.init_params(cfg.laserscan_length, seed=1)}
    sensors = ("other_agents_states", "laserscan")
    state, obs = env_reset(state, cfg, sensors, ("dist_to_goal", "laserscan"), static)
    for _ in range(5):
        state, obs, rew, go, info = env_step(
            state, None, cfg, params, (pol.DRL_LONG,), sensors,
            ("dist_to_goal", "laserscan"), static,
        )
    assert np.isfinite(np.asarray(state.pos)).all()
    assert not np.allclose(np.asarray(state.pos), [[-3, 0], [3, 0]])


def test_shipped_trained_drl_long_checkpoint_loads_and_runs():
    """The round-5 TPU-trained DRL-Long net (the policy the reference
    ships broken): the vendored checkpoint must load and produce finite
    in-range actions (its suite quality — 92.6% success learner-vs-RVO
    on the frozen 2-agent 500 cases — is recorded in RESULTS.md and
    reproduced by scripts/eval_drl_long.py)."""
    import os

    import jax.numpy as jnp

    from gym_collision_avoidance_tpu.models import drl_long

    path = os.path.join(
        os.path.dirname(drl_long.__file__), "weights",
        "drl_long_2agent_rvo_tpu.npz",
    )
    with np.load(path) as z:
        params = {k: jnp.asarray(z[k]) for k in z.files}
    B, L = 3, 512
    rng = np.random.RandomState(0)
    mean, log_std, value = drl_long.forward_actor_critic(
        params,
        jnp.asarray(rng.rand(B, 3, L) - 0.5, jnp.float32),
        jnp.asarray(rng.rand(B, 2) * 4, jnp.float32),
        jnp.asarray(rng.rand(B, 2), jnp.float32),
    )
    assert mean.shape == (B, 2) and value.shape == (B,)
    assert np.isfinite(np.asarray(mean)).all()
    assert (np.asarray(mean) >= 0).all() and (np.asarray(mean) <= 1).all()
    assert np.isfinite(np.asarray(value)).all()
