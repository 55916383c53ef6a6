"""End-to-end RL training example: a LearningPolicy agent trained with
REINFORCE against NonCooperative traffic, entirely on-device.

This is the TPU-native analog of the reference's external-RL workflow
(``LearningPolicy.external_action_to_action``, envs/policies/LearningPolicy.py:5-35
+ the gym step loop): the learner receives the flattened ego observation,
emits a continuous action in [0, 1]^2, and the env maps it to
[speed, delta-heading].  Everything — rollout, reward accumulation,
policy gradient — runs inside ONE jitted function per iteration; there is
no Python env loop.

Usage: python scripts/train_example.py [--iters 30] [--envs 256] [--cpu]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(E, T, seed=0, dtype="float32", num_agents=2):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gym_collision_avoidance_tpu import EnvConfig
    from gym_collision_avoidance_tpu.env.batch import batched_env_step
    from gym_collision_avoidance_tpu.env.step import env_reset
    from gym_collision_avoidance_tpu.obs import spec as obs_spec
    from gym_collision_avoidance_tpu.policies import registry as P
    from gym_collision_avoidance_tpu.scenarios import random_cases

    # reward_time_step is the reference's REWARD_TIME_STEP knob
    # (envs/config.py:35, "encourage speed"): without it, REINFORCE
    # collapses to standing still (zero reward beats collision risk).
    cfg = EnvConfig(dtype=dtype, done_mode="learning", reward_time_step=-0.01)
    states_in_obs = obs_spec.DEFAULT_STATES_IN_OBS
    A = num_agents
    active = (P.LEARNING, P.NONCOOP)
    policy_id = np.array([P.LEARNING] + [P.NONCOOP] * (A - 1), np.int32)

    # few cases, many peer envs per case: the per-scenario baseline needs
    # multiple same-case rollouts to compare (1 env per case would make
    # every advantage exactly zero)
    n_cases = max(1, E // 8)
    pool = jnp.asarray(
        random_cases.scenario_pool(n_cases, A, seed=seed, side_length=3.0),
        jnp.dtype(dtype),
    )

    from gym_collision_avoidance_tpu.env.autoreset import state_from_case

    def reset_batch():
        def one(i):
            st = state_from_case(cfg, pool[i % pool.shape[0]], policy_id,
                                 rng=jax.random.PRNGKey(seed + 1))
            st, obs = env_reset(st, cfg, ("other_agents_states",), states_in_obs)
            return st, obs

        return jax.vmap(one)(jnp.arange(E))

    # flattened ego obs width (learner consumes agent row 0)
    _, obs0 = reset_batch()
    obs_dim = sum(
        int(np.prod(np.asarray(v.shape[2:]), initial=1)) for v in obs0.values()
    )

    def flatten_ego(obs):
        parts = [v[:, 0].reshape(E, -1).astype(jnp.float32) for v in obs.values()]
        return jnp.concatenate(parts, axis=-1)

    H = 64

    def init_policy(rng):
        k1, k2 = jax.random.split(rng)
        s1 = (2.0 / obs_dim) ** 0.5
        s2 = (2.0 / H) ** 0.5
        return {
            "W1": jax.random.normal(k1, (obs_dim, H), jnp.float32) * s1,
            "b1": jnp.zeros((H,), jnp.float32),
            "W2": jax.random.normal(k2, (H, 4), jnp.float32) * s2,
            "b2": jnp.zeros((4,), jnp.float32),
        }

    def policy_dist(p, x):
        h = jax.nn.relu(x @ p["W1"] + p["b1"])
        out = h @ p["W2"] + p["b2"]
        mean = jax.nn.sigmoid(out[:, :2])          # action in [0, 1]^2
        # std starts near 0.14 (an init at 0 would mean std=1 on a [0,1]
        # action space — every sample rails against the clip and the
        # likelihood-ratio gradient turns to noise)
        log_std = jnp.clip(out[:, 2:] - 2.0, -3.0, -0.7)
        return mean, log_std

    def rollout(p, rng):
        """One T-step on-policy rollout; returns (mean return, grads-ready
        surrogate loss pieces)."""
        states, obs = reset_batch()

        def step(carry, _):
            states, obs, rng = carry
            # REINFORCE treats visited states as data: cut the gradient
            # path through the env dynamics (whose VJP is NaN at frozen
            # agents' sqrt(0)/arctan2(0,0) corners and is not part of the
            # policy-gradient estimator anyway).
            x = jax.lax.stop_gradient(flatten_ego(obs))
            mean, log_std = policy_dist(p, x)
            rng, k = jax.random.split(rng)
            eps = jax.random.normal(k, mean.shape, jnp.float32)
            act = jnp.clip(mean + jnp.exp(log_std) * eps, 0.0, 1.0)
            logp = jnp.sum(
                -0.5 * ((act - mean) / jnp.exp(log_std)) ** 2 - log_std, axis=-1
            )
            # actions taken after the learner's episode ended are frozen by
            # the env; their logp terms are pure gradient noise
            alive = (~states.is_done[:, 0]).astype(jnp.float32)
            logp = logp * alive
            d_prev = states.dist_to_goal[:, 0].astype(jnp.float32)
            ext = jnp.zeros((E, A, 2), jnp.dtype(dtype))
            ext = ext.at[:, 0, :].set(
                jax.lax.stop_gradient(act).astype(jnp.dtype(dtype))
            )
            states, obs, rew, _go, _info = batched_env_step(
                states, ext, cfg, None, active,
                ("other_agents_states",), states_in_obs,
            )
            # potential-based progress shaping (training-side only; the
            # env's reward semantics are untouched): dense gradient toward
            # the goal so REINFORCE doesn't collapse to standing still on
            # the sparse +1
            shaped = rew[:, 0].astype(jnp.float32) + 0.3 * (
                d_prev - states.dist_to_goal[:, 0].astype(jnp.float32)
            )
            return (states, obs, rng), (shaped, logp)

        (_s, _o, _r), (rews, logps) = jax.lax.scan(
            step, (states, obs, rng), None, length=T
        )
        returns = jnp.sum(rews, axis=0)                         # [E]
        # reward-to-go: each action's weight is only the reward it can
        # still influence (rtg[t] = sum_{t' >= t} r[t']) — strictly lower
        # gradient variance than weighting every logp by the full return
        rtg = jnp.cumsum(rews[::-1], axis=0)[::-1]              # [T, E]
        # per-(scenario, t) baseline: env i runs pool case i % P, so
        # comparing against same-case peers at the same timestep removes
        # the (large) case-difficulty variance that otherwise drowns the
        # action signal
        Pn = pool.shape[0]
        sc = jnp.arange(E) % Pn
        onehot = (sc[:, None] == jnp.arange(Pn)[None, :]).astype(jnp.float32)
        cnt = jnp.maximum(onehot.sum(0), 1.0)
        base = ((rtg @ onehot) / cnt) @ onehot.T                # [T, E]
        adv = rtg - base
        loss = -jnp.mean(jnp.sum(logps * jax.lax.stop_gradient(adv), axis=0))
        return loss, jnp.mean(returns)

    @jax.jit
    def train_step(p, opt_state, rng):
        import optax

        (loss, ret), grads = jax.value_and_grad(rollout, has_aux=True)(p, rng)
        updates, opt_state = _tx().update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        return p, opt_state, loss, ret

    @functools.lru_cache(maxsize=1)
    def _tx():
        import optax

        return optax.adam(3e-3)

    def run(iters, rng=None):
        rng = jax.random.PRNGKey(seed) if rng is None else rng
        p = init_policy(rng)
        opt_state = _tx().init(p)
        rets = []
        for i in range(iters):
            rng, k = jax.random.split(rng)
            p, opt_state, loss, ret = train_step(p, opt_state, k)
            rets.append(float(ret))
            print(f"iter {i:3d}  mean return {float(ret):+.3f}", flush=True)
        return p, rets

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--horizon", type=int, default=40)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    run = build(args.envs, args.horizon)
    _p, rets = run(args.iters)
    import numpy as np

    k = max(3, len(rets) // 5)
    print(f"first-{k} mean {np.mean(rets[:k]):+.3f} -> last-{k} mean "
          f"{np.mean(rets[-k:]):+.3f}")


if __name__ == "__main__":
    main()
