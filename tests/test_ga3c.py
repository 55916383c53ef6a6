"""GA3C-CADRL network + policy parity vs the reference TF1 graph."""

import numpy as np
import pytest

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.harness import runner
from gym_collision_avoidance_tpu.models import ga3c_cadrl as net
from gym_collision_avoidance_tpu.scenarios import presets

from tests.oracle import refsim

CKPT = (
    "/root/reference/gym_collision_avoidance/envs/policies/GA3C_CADRL/"
    "checkpoints/IROS18/network_01900000"
)


@pytest.fixture(scope="module")
def tf_net():
    refsim.import_reference()
    from gym_collision_avoidance.envs.policies.GA3C_CADRL import network

    nn = network.NetworkVP_rnn("/cpu:0", "network", network.Actions().num_actions)
    nn.simple_load(CKPT)
    return nn


def _random_obs_batch(rng, n, max_other=19):
    x = np.zeros((n, 5 + max_other * 7), dtype=np.float64)
    x[:, 0] = rng.randint(0, max_other + 1, n)              # num others
    x[:, 1] = rng.uniform(0.5, 15.0, n)                     # dist_to_goal
    x[:, 2] = rng.uniform(-np.pi, np.pi, n)                 # heading_ego
    x[:, 3] = rng.uniform(0.2, 2.0, n)                      # pref_speed
    x[:, 4] = rng.uniform(0.2, 0.8, n)                      # radius
    others = rng.uniform(-1, 1, (n, max_other, 7))
    others[:, :, 0:2] *= 6.0                                # rel pos
    others[:, :, 4] = rng.uniform(0.2, 0.8, (n, max_other))
    others[:, :, 5] = others[:, :, 4] + 0.5
    others[:, :, 6] = rng.uniform(0.0, 8.0, (n, max_other))
    x[:, 5:] = others.reshape(n, -1)
    return x


def test_forward_matches_tf(tf_net):
    rng = np.random.RandomState(7)
    x = _random_obs_batch(rng, 64)
    ref_probs = tf_net.predict_p(x)
    probs, _ = net.forward(net.load_params(), x.astype(np.float32))
    np.testing.assert_allclose(np.asarray(probs), ref_probs, atol=2e-5)
    # Discrete action choice must agree on all non-knife-edge rows.
    ref_idx = np.argmax(ref_probs, axis=1)
    our_idx = np.argmax(np.asarray(probs), axis=1)
    assert (ref_idx == our_idx).mean() == 1.0


@pytest.mark.parametrize(
    "name,ckpt",
    [
        (
            "20190727_015942",
            "/root/reference/gym_collision_avoidance/envs/policies/GA3C_CADRL/"
            "checkpoints/run-20190727_015942-jzuhlntn/network_01490000",
        ),
        (
            "20190727_192048",
            "/root/reference/gym_collision_avoidance/envs/policies/GA3C_CADRL/"
            "checkpoints/run-20190727_192048-qedrf08y/network_01900000",
        ),
    ],
)
def test_extra_checkpoints_match_tf(name, ckpt):
    """The two 2019 runs the reference ships alongside IROS18 (the
    commented GA3C-CADRL-4-LSTM registry entry, env_utils.py:475-480)."""
    refsim.import_reference()
    from gym_collision_avoidance.envs.policies.GA3C_CADRL import network

    nn = network.NetworkVP_rnn("/cpu:0", f"network_{name}", network.Actions().num_actions)
    nn.simple_load(ckpt)
    rng = np.random.RandomState(11)
    x = _random_obs_batch(rng, 32)
    ref_probs = nn.predict_p(x)
    probs, _ = net.forward(net.load_params(net.CHECKPOINTS[name]), x.astype(np.float32))
    np.testing.assert_allclose(np.asarray(probs), ref_probs, atol=2e-5)
    assert (np.argmax(ref_probs, axis=1) == np.argmax(np.asarray(probs), axis=1)).mean() == 1.0


def test_registry_selects_checkpoint():
    """harness registry keys 'ga3c_cadrl:<name>' land the right weights
    under the shared 'ga3c_cadrl' params slot."""
    from gym_collision_avoidance_tpu.harness import registry as hreg

    p = hreg.load_params("ga3c_cadrl:20190727_015942")
    q = net.load_params(net.CHECKPOINTS["20190727_015942"])
    np.testing.assert_array_equal(
        np.asarray(p["ga3c_cadrl"]["layer1_kernel"]), np.asarray(q["layer1_kernel"])
    )
    base = hreg.load_params("ga3c_cadrl")
    iros = net.load_params()
    np.testing.assert_array_equal(
        np.asarray(base["ga3c_cadrl"]["layer1_kernel"]), np.asarray(iros["layer1_kernel"])
    )


def test_forward_zero_others(tf_net):
    # seq_len = 0: LSTM state stays zero (dynamic_rnn copy-through).
    x = np.zeros((3, 138))
    x[:, 1] = [1.0, 5.0, 10.0]
    x[:, 3] = 1.0
    x[:, 4] = 0.5
    ref = tf_net.predict_p(x)
    ours, _ = net.forward(net.load_params(), x.astype(np.float32))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def _ga3c_cfg():
    return EnvConfig(
        dtype="float64",
        done_mode="learning",
        max_num_other_agents_observed=19,
        agent_sorting_method="closest_last",
    )


def _make_ref_ga3c_env(case):
    refsim.import_reference()
    from gym_collision_avoidance.envs.collision_avoidance_env import (
        CollisionAvoidanceEnv,
    )
    from gym_collision_avoidance.envs.agent import Agent
    from gym_collision_avoidance.envs import test_cases as tc

    env = CollisionAvoidanceEnv()
    agents = []
    for i, row in enumerate(np.asarray(case)):
        px, py, gx, gy, v, r = row
        heading = np.arctan2(gy - py, gx - px)
        a = Agent(px, py, gx, gy, r, v, heading, tc.policy_dict["GA3C_CADRL"],
                  tc.dynamics_dict["unicycle"],
                  [tc.sensor_dict["other_agents_states"]], i)
        a.policy.initialize_network(checkpt_dir="IROS18",
                                    checkpt_name="network_01900000")
        a.sensors[0].set_args(
            {"agent_sorting_method": "closest_last",
             "max_num_other_agents_observed": 19}
        )
        agents.append(a)
    env.set_agents(agents)
    env.reset()
    return env


@pytest.mark.parametrize("scenario", ["swap", "circle"])
def test_env_rollout_matches_reference(scenario):
    if scenario == "swap":
        case = np.array(
            [[-3.0, 0.0, 3.0, 0.0, 1.0, 0.5], [3.0, 0.0, -3.0, 0.0, 1.0, 0.5]]
        )
        steps = 60
    else:
        sc0 = presets.circle_scenario(4, radius=4.0, agent_radius=0.4)
        case = np.concatenate(
            [sc0.pos, sc0.goal, sc0.pref_speed[:, None], sc0.radius[:, None]], -1
        )
        steps = 80

    env = _make_ref_ga3c_env(case)
    ref = refsim.rollout(env, steps)

    cfg = _ga3c_cfg()
    sc = presets.from_cadrl_case(case, policy="GA3C_CADRL")
    state = sc.to_state(cfg)
    from gym_collision_avoidance_tpu.env.step import env_reset
    from gym_collision_avoidance_tpu.models import ga3c_cadrl

    state, _ = env_reset(state, cfg)
    params = {"ga3c_cadrl": ga3c_cadrl.load_params()}
    _, traj = runner.rollout(
        state, cfg, steps, params=params, active_policies=sc.active_policies
    )
    np.testing.assert_allclose(np.asarray(traj["pos"]), ref["pos"], atol=5e-4)
    np.testing.assert_array_equal(
        np.asarray(traj["is_at_goal"]), ref["is_at_goal"]
    )
    np.testing.assert_array_equal(
        np.asarray(traj["in_collision"]), ref["in_collision"]
    )


def test_bf16_fast_path_argmax_agreement():
    import jax.numpy as jnp

    rng = np.random.RandomState(13)
    x = _random_obs_batch(rng, 256)
    p32 = net.load_params()
    pbf = net.load_params(dtype=jnp.bfloat16)
    probs32, _ = net.forward(p32, x.astype(np.float32))
    probsbf, _ = net.forward(pbf, x.astype(np.float32))
    a32 = np.argmax(np.asarray(probs32), axis=1)
    abf = np.argmax(np.asarray(probsbf), axis=1)
    assert (a32 == abf).mean() >= 0.98, (a32 != abf).sum()
    np.testing.assert_allclose(
        np.asarray(probsbf, np.float32), np.asarray(probs32), atol=0.05
    )


def test_forward_parts_matches_flat():
    # the structured-input fast path must reproduce the flat forward
    # bit-for-bit (same normalization, same trunk, no crop/pad involved)
    rng = np.random.RandomState(13)
    x = _random_obs_batch(rng, 32).astype(np.float32)
    p = net.load_params()
    K = (p["input_avg"].shape[0] - 5) // 7
    flat_p, flat_v = net.forward(p, x, max_seq_len=3)
    part_p, part_v = net.forward_parts(
        p, x[:, :5], x[:, 5:].reshape(-1, K, 7), max_seq_len=3
    )
    np.testing.assert_array_equal(np.asarray(flat_p), np.asarray(part_p))
    np.testing.assert_array_equal(np.asarray(flat_v), np.asarray(part_v))
