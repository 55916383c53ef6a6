"""PPO trainer for the LearningPolicy path, entirely on-device.

The reference frames this environment as a gym for *external* RL
trainers: the agent under training is a ``LearningPolicy`` whose actions
arrive through the env's step argument
(envs/collision_avoidance_env.py:208-218, LearningPolicy.py:5-35) while
scripted traffic (NonCooperative / RVO / GA3C) moves internally.  The
reference ships no trainer of its own; this module is the TPU-native
one — PPO (clipped surrogate, Schulman et al. 2017) with GAE(lambda),
built so that rollout, advantage estimation, and every optimizer epoch
run inside ONE jitted function per iteration:

* **Rollout** is a ``lax.scan`` over the in-graph autoreset step
  (:mod:`env.autoreset`), so episodes reset mid-rollout and every
  timestep advances a live episode — no Python env loop, no host sync.
* **Advantages** come from a reverse ``lax.scan`` with ``(1 - done)``
  masking across the autoreset boundaries (the fresh obs returned on a
  reset step belongs to the NEW episode, so the bootstrap term is cut
  exactly at the boundary).
* **Minibatching** shuffles the *env axis* (one gather of env-major rows
  per epoch, outside the hot step loop) and scans over minibatches; each
  minibatch is ``mb_envs`` full T-step sample streams (one per
  env x learner agent).  Per-sample shuffling
  would gather [T*E] scattered rows every epoch — pointlessly
  gather-heavy on TPU for no statistical win at these batch sizes.
* **Data parallelism**: pass ``axis_name`` and run the returned
  ``train_step`` under ``shard_map`` with the env axis sharded; gradients
  and metrics are ``lax.pmean``-ed per minibatch, so every device applies
  identical updates (standard DP-PPO; exercised on the virtual mesh in
  tests/test_ppo.py).

Two policy families (``PPOConfig.policy_arch``): a plain MLP actor-critic
emitting a diagonal Gaussian over the LearningPolicy's ``[0, 1]^2`` box
(speed fraction, heading fraction; LearningPolicy.py:31-33 — samples
clipped to the box, log-densities evaluated at the stored clipped action,
identically at rollout and update time so the first-epoch ratio is
exactly 1), and the reference's own GA3C-CADRL LSTM architecture with a
categorical over its 11 discrete actions (LearningPolicyGA3C table).
``PPOConfig.self_play`` trains every agent on the shared net
(alive-masked losses for mid-episode frozen agents).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gym_collision_avoidance_tpu.config import EnvConfig
from gym_collision_avoidance_tpu.env import autoreset
from gym_collision_avoidance_tpu.env.step import env_reset
from gym_collision_avoidance_tpu.obs import spec as obs_spec
from gym_collision_avoidance_tpu.policies import registry as policies


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Static PPO hyperparameters (jit-time constants)."""

    num_envs: int = 256
    horizon: int = 64              # T steps per rollout
    num_agents: int = 2
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    epochs: int = 4
    num_minibatches: int = 4       # along the env axis
    lr: float = 3e-4
    value_coef: float = 0.5
    entropy_coef: float = 1e-3
    max_grad_norm: float = 0.5
    hidden: int = 256              # 2x128 lanes; tiles the MXU cleanly
    # dense progress shaping added to the env reward on the training side
    # only (same rationale as the REINFORCE example: the env's sparse +1
    # at the goal leaves a zero-gradient plateau early in training)
    shaping_coef: float = 0.3
    traffic_policy: int = policies.NONCOOP
    # "mlp": continuous Gaussian MLP through the LearningPolicy [0, 1]^2
    #   action box (LearningPolicy.py:31-33).
    # "ga3c": the reference's own GA3C-CADRL architecture (LSTM over
    #   other-agent tuples + 3x Dense(256), 11 discrete actions through
    #   the LearningPolicyGA3C table) trained from scratch — the
    #   reference trained this net externally with GA3C
    #   (ga3c/GA3C/NetworkVP_rnn.py); here it trains on-device.
    # "drl_long": the DRL-Long laserscan CNN architecture
    #   (DRLLongPolicy.py / models/drl_long.py) with a critic head,
    #   trained from scratch through the continuous Gaussian family —
    #   the reference ships this policy BROKEN (empty submodule, no
    #   checkpoint); here a working one trains on-device on the 3-deep
    #   scan stack.
    policy_arch: str = "mlp"
    # False: agent 0 learns against scripted traffic_policy agents.
    # True: EVERY agent runs (and trains) the same shared net — the
    #   parameter-shared self-play regime the GA3C-CADRL papers trained
    #   in (decentralized execution, shared weights).  Done agents freeze
    #   mid-episode (done_mode="learning" waits for all of them); their
    #   frozen samples carry zero loss weight.
    self_play: bool = False
    seed: int = 0

    @property
    def mb_envs(self) -> int:
        """Learner sample streams per minibatch (env x learner-agent)."""
        num_streams = self.num_envs * (
            self.num_agents if self.self_play else 1
        )
        assert num_streams % self.num_minibatches == 0
        return num_streams // self.num_minibatches


def init_actor_critic(rng, obs_dim: int, hidden: int = 256):
    """He-initialized MLP trunk + small-scale policy/value heads.

    Head weights start at 1e-2 scale so the initial policy is near the
    sigmoid midpoint with near-constant value — standard PPO practice to
    keep early ratios tame.
    """
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    s1 = (2.0 / obs_dim) ** 0.5
    s2 = (2.0 / hidden) ** 0.5
    f32 = jnp.float32
    return {
        "W1": jax.random.normal(k1, (obs_dim, hidden), f32) * s1,
        "b1": jnp.zeros((hidden,), f32),
        "W2": jax.random.normal(k2, (hidden, hidden), f32) * s2,
        "b2": jnp.zeros((hidden,), f32),
        # policy head: 2 action means
        "Wp": jax.random.normal(k3, (hidden, 2), f32) * (s2 * 1e-2),
        "bp": jnp.zeros((2,), f32),
        # state-independent log-std, started at exp(-1.2) ~ 0.3 of the
        # [0, 1] action box
        "log_std": jnp.full((2,), -1.2, f32),
        # value head
        "Wv": jax.random.normal(k4, (hidden, 1), f32) * s2,
        "bv": jnp.zeros((1,), f32),
    }


def _trunk(p, x):
    h = jax.nn.relu(x @ p["W1"] + p["b1"])
    return jax.nn.relu(h @ p["W2"] + p["b2"])


def actor_critic(p, x):
    """(mean in (0,1)^2, log_std [2], value) for flattened ego obs x."""
    h = _trunk(p, x)
    mean = jax.nn.sigmoid(h @ p["Wp"] + p["bp"])
    value = (h @ p["Wv"] + p["bv"])[..., 0]
    log_std = jnp.clip(p["log_std"], -4.0, 0.0)
    return mean, log_std, value


def _gauss_logp(act, mean, log_std):
    """Diagonal-Gaussian log density at the stored (clipped) action."""
    z = (act - mean) * jnp.exp(-log_std)
    return jnp.sum(-0.5 * z * z - log_std - 0.5 * np.log(2.0 * np.pi), axis=-1)


def compute_gae(rewards, values, dones, last_value, gamma, lam):
    """GAE(lambda) over a [T, E] rollout with autoreset boundaries.

    ``dones[t]`` marks that the transition at t ENDED its episode; the
    bootstrap value for that transition is cut (the t+1 obs/value belongs
    to the next episode).  Returns (advantages [T, E], value targets).
    """

    def scan_fn(carry, x):
        gae, next_val = carry
        r, v, d = x
        nonterm = 1.0 - d
        delta = r + gamma * next_val * nonterm - v
        gae = delta + gamma * lam * nonterm * gae
        return (gae, v), gae

    (_, _), adv = jax.lax.scan(
        scan_fn,
        (jnp.zeros_like(last_value), last_value),
        (rewards, values, dones.astype(rewards.dtype)),
        reverse=True,
    )
    return adv, adv + values


def make_ppo(
    ppo: PPOConfig,
    cfg: Optional[EnvConfig] = None,
    pool=None,
    axis_name: Optional[str] = None,
    sensors: Tuple[str, ...] = ("other_agents_states",),
    states_in_obs: Tuple[str, ...] = obs_spec.DEFAULT_STATES_IN_OBS,
    static_cells=None,
):
    """Build the jitted PPO iteration.

    Returns ``(train_step, init_fn, obs_dim)`` where

    * ``init_fn(rng) -> (params, opt_state, env_states, counters, obs)``
    * ``train_step(params, opt_state, env_states, counters, obs, rng) ->
      (params, opt_state, env_states, counters, obs, metrics)`` — one
      rollout + ``epochs`` optimization epochs, all inside jit.  Env
      states AND the pending obs carry over between iterations
      (continuing autoreset episodes), so every step of every iteration
      advances a live episode; carrying obs (rather than recomputing it)
      keeps sensors with internal history (laserscan ring buffer)
      exact — sensing is a state-mutating pass, not a pure read.

    With ``axis_name`` set, run ``train_step`` under ``shard_map`` with
    ``env_states``/``counters`` sharded on the env axis and
    params/opt_state replicated; gradients are ``pmean``-ed before the
    update, so replicas stay bit-identical.
    """
    import optax

    E, T, A = ppo.num_envs, ppo.horizon, ppo.num_agents
    cfg = cfg or EnvConfig(
        dtype="float32", done_mode="learning", reward_time_step=-0.01,
        # drl_long: use_static_map allocates the scan-history ring in
        # EnvState (core/state.py:195); the world stays agents-only
        # unless static_cells is passed
        use_static_map=ppo.policy_arch == "drl_long",
    )
    if ppo.policy_arch == "drl_long" and not cfg.use_static_map:
        raise ValueError(
            "drl_long arch needs cfg.use_static_map=True (allocates the "
            "laserscan history ring; pass static_cells=[] for an "
            "agents-only world)"
        )
    dtype = jnp.dtype(cfg.dtype)

    if pool is None:
        from gym_collision_avoidance_tpu.scenarios import random_cases

        pool = jnp.asarray(
            random_cases.scenario_pool(64, A, seed=ppo.seed, side_length=3.0),
            dtype,
        )
    else:
        pool = jnp.asarray(pool, dtype)

    learner_pid = (
        policies.LEARNING_GA3C if ppo.policy_arch == "ga3c"
        else policies.LEARNING
    )
    if ppo.policy_arch == "drl_long" and "laserscan" not in sensors:
        # the DRL-Long CNN consumes the 3-deep scan stack; agents-only
        # world by default (empty static-cell list -> the gather-free
        # sparse laserscan needs no map)
        sensors = tuple(sensors) + ("laserscan",)
        states_in_obs = tuple(
            k for k in states_in_obs if k != "laserscan"
        ) + ("laserscan",)
    if static_cells is None and "laserscan" in sensors:
        static_cells = jnp.zeros((0, 2), jnp.int32)
    # L learner agents per env; B learner sample streams per step
    L = A if ppo.self_play else 1
    B = E * L
    if ppo.self_play:
        policy_id = np.full(A, learner_pid, np.int32)
        active = (int(learner_pid),)
    else:
        policy_id = np.array(
            [learner_pid] + [ppo.traffic_policy] * (A - 1), np.int32
        )
        active = tuple(sorted({int(learner_pid), int(ppo.traffic_policy)}))
    astep = autoreset.make_autoreset_step(
        cfg, pool, policy_id, active_policies=active, sensors=sensors,
        states_in_obs=states_in_obs, static_cells=static_cells,
    )

    # flattened ego obs width, from one probe reset (host-side, build time)
    probe = autoreset.state_from_case(cfg, pool[0], policy_id)
    _, probe_obs = env_reset(probe, cfg, sensors, states_in_obs, None,
                             static_cells)

    if ppo.policy_arch == "ga3c":
        # the GA3C net consumes the policy-obs layout: every obs key
        # except STATES_NOT_USED_IN_POLICY, in STATES_IN_OBS order
        # (GA3CCADRLPolicy.py:68-74) — [num_other, dist_to_goal,
        # heading_ego, pref_speed, radius, K x 7 other tuples]
        ego_keys = tuple(
            k for k in states_in_obs
            if k not in obs_spec.DEFAULT_STATES_NOT_USED_IN_POLICY
        )
    elif ppo.policy_arch == "drl_long":
        # the DRL-Long CNN consumes [polar local goal, kinematic scalars,
        # 3-deep scan stack] — fixed layout, scan LAST (net_apply splits
        # on it)
        ego_keys = ("dist_to_goal", "heading_ego_frame", "pref_speed",
                    "radius", "laserscan")
        missing = [k for k in ego_keys if k not in tuple(states_in_obs)]
        assert not missing, f"drl_long arch needs obs keys {missing}"
    else:
        ego_keys = tuple(states_in_obs)
    obs_dim = int(
        sum(np.prod(np.asarray(probe_obs[k].shape[1:]), initial=1)
            for k in ego_keys)
    )

    def flatten_ego(obs):
        """Batched obs dict -> [B, obs_dim] float32 learner rows
        (agents 0..L-1 of every env, env-major)."""
        parts = [
            obs[k][:, :L].reshape(B, -1).astype(jnp.float32)
            for k in ego_keys
        ]
        return jnp.concatenate(parts, axis=-1)

    # --- policy family: net init/apply + distribution ops -------------
    if ppo.policy_arch == "ga3c":
        from gym_collision_avoidance_tpu.models import ga3c_cadrl

        K_other = (obs_dim - 5) // 7
        assert 5 + 7 * K_other == obs_dim, (obs_dim, K_other)
        n_act = ga3c_cadrl.NUM_ACTIONS

        def net_init(rng):
            return ga3c_cadrl.init_params(rng, K_other)

        def net_apply(params, x):
            logits, value = ga3c_cadrl.forward_parts_logits(
                params, x[:, :5], x[:, 5:].reshape(x.shape[0], K_other, 7),
                max_seq_len=A - 1,
            )
            return (logits,), value

        def dist_sample(out, key, ids):
            (logits,) = out
            idx = jax.vmap(
                lambda i, lg: jax.random.categorical(
                    jax.random.fold_in(key, i), lg
                )
            )(ids, logits)
            return idx[:, None].astype(jnp.float32)             # [B, 1]

        def dist_logp(out, act):
            (logits,) = out
            ls = jax.nn.log_softmax(logits, axis=-1)
            onehot = (
                jnp.arange(n_act)[None, :]
                == act[:, 0].astype(jnp.int32)[:, None]
            ).astype(ls.dtype)
            # masked sum, not a gather/dot (PERF.md "small contractions")
            return jnp.sum(onehot * ls, axis=-1)

        def dist_entropy(out):
            (logits,) = out
            ls = jax.nn.log_softmax(logits, axis=-1)
            return -jnp.sum(jnp.exp(ls) * ls, axis=-1)          # [B]

        def to_ext(act):  # [B, 1] action index -> [B, 2] external row
            return jnp.concatenate([act, jnp.zeros_like(act)], axis=-1)

    else:
        if ppo.policy_arch == "drl_long":
            from gym_collision_avoidance_tpu.models import drl_long

            L_scan = cfg.laserscan_length
            assert obs_dim == 4 + 3 * L_scan, (obs_dim, L_scan)

            def net_init(rng):
                return drl_long.init_actor_critic_params(
                    L_scan, seed=int(jax.random.randint(rng, (), 0, 2**31 - 1))
                )

            def net_apply(params, x):
                # layout per ego_keys: [d_goal, heading_ego, pref, r, scans]
                scan = x[:, 4:].reshape(x.shape[0], drl_long.FRAMES, L_scan)
                # the reference's scan normalization (DRLLongPolicy.py:81)
                scan = scan / 6.0 - 0.5
                mean, log_std, value = drl_long.forward_actor_critic(
                    params, scan, x[:, 0:2], x[:, 2:4]
                )
                return (mean, log_std), value

        else:

            def net_init(rng):
                return init_actor_critic(rng, obs_dim, ppo.hidden)

            def net_apply(params, x):
                mean, log_std, value = actor_critic(params, x)
                return (mean, log_std), value

        def dist_sample(out, key, ids):
            mean, log_std = out
            eps = jax.vmap(
                lambda i: jax.random.normal(
                    jax.random.fold_in(key, i), (2,), jnp.float32
                )
            )(ids)
            return jnp.clip(mean + jnp.exp(log_std) * eps, 0.0, 1.0)

        def dist_logp(out, act):
            mean, log_std = out
            return _gauss_logp(act, mean, log_std)

        def dist_entropy(out):
            mean, log_std = out
            ent = jnp.sum(log_std + 0.5 * np.log(2.0 * np.pi * np.e))
            return jnp.broadcast_to(ent, mean.shape[:1])        # [B]

        def to_ext(act):
            return act

    tx = optax.chain(
        optax.clip_by_global_norm(ppo.max_grad_norm),
        optax.adam(ppo.lr),
    )

    def reset_batch():
        def one(i):
            st = autoreset.state_from_case(
                cfg, pool[i % pool.shape[0]], policy_id,
                rng=jax.random.PRNGKey(ppo.seed + 1),
            )
            return env_reset(st, cfg, sensors, states_in_obs, None,
                             static_cells)

        # jit: eager vmapped resets dispatch op-by-op (through the axon
        # tunnel that cost ~30 s of trainer startup, round 4)
        return jax.jit(jax.vmap(one))(jnp.arange(E))

    def init_fn(rng):
        params = net_init(rng)
        states, obs = reset_batch()
        return (params, tx.init(params), states,
                jnp.arange(E, dtype=jnp.int32), obs)

    def rollout(params, states, counters, obs, rng):
        """T autoreset steps; gradients never flow into the env (visited
        states are data — same stop_gradient rationale as the REINFORCE
        example: the env dynamics' VJP is NaN at frozen agents' sqrt(0)
        corners and is no part of the PPO estimator)."""

        # Per-env global ids key the exploration noise: eps[e] is drawn
        # from fold_in(key_t, global_id(e)), so the sampled trajectories
        # are IDENTICAL whether the env batch runs on one device or
        # sharded across a mesh (shape-keyed normal(key, [E_local, 2])
        # would give every shard different noise than the unsharded run).
        if axis_name:
            env_ids = jax.lax.axis_index(axis_name) * E + jnp.arange(E)
        else:
            env_ids = jnp.arange(E)
        # one id per learner sample stream, stable across sharding
        ids = (env_ids[:, None] * L + jnp.arange(L)[None, :]).reshape(B)

        def step(carry, key):
            states, counters, obs = carry
            x = jax.lax.stop_gradient(flatten_ego(obs))                # [B, D]
            # learners already done (frozen by the env) contribute zero
            # loss weight; their "actions" are ignored by the env anyway
            alive = (~states.is_done[:, :L]).reshape(B).astype(jnp.float32)
            out, value = net_apply(params, x)
            act = dist_sample(out, key, ids)
            logp = dist_logp(out, act)
            d_prev = states.dist_to_goal[:, :L].astype(jnp.float32)    # [E, L]
            # concat, not .at[].set: scatter updates force layout copies
            # on TPU (PERF.md)
            ext = jnp.concatenate(
                [to_ext(act).astype(dtype).reshape(E, L, 2),
                 jnp.zeros((E, A - L, 2), dtype)],
                axis=1,
            )
            states, counters, obs, rew, game_over = jax.vmap(astep)(
                states, counters, ext
            )
            go_f = game_over.astype(jnp.float32)[:, None]              # [E, 1]
            raw = rew[:, :L].astype(jnp.float32)                       # [E, L]
            shaped = raw + ppo.shaping_coef * (
                d_prev - states.dist_to_goal[:, :L].astype(jnp.float32)
            ) * (1.0 - go_f)
            # per-sample done: the env reset, or this learner's episode
            # latched done (value bootstrap is cut either way)
            done = (game_over[:, None] | states.is_done[:, :L]).reshape(B)
            out = (x, act, logp, value, shaped.reshape(B), done, alive,
                   raw.reshape(B), game_over)
            return (states, counters, obs), out

        keys = jax.random.split(rng, T)
        (states, counters, obs), out = jax.lax.scan(
            step, (states, counters, obs), keys
        )
        xs, acts, logps, vals, rews, dones, alive, raw_rews, game_over = out
        _, last_value = net_apply(params, flatten_ego(obs))
        return states, counters, obs, {
            "x": xs, "act": acts, "logp": logps, "value": vals,
            "reward": rews, "done": dones, "alive": alive,
            "raw_reward": raw_rews, "game_over": game_over,
            "last_value": last_value,
        }

    def _pmean(v):
        return jax.lax.pmean(v, axis_name) if axis_name else v

    def loss_fn(params, batch):
        """Clipped-surrogate PPO loss over one minibatch of [n] samples.
        ``alive`` weights mask frozen (already-done) learner samples."""
        out, value = net_apply(params, batch["x"])
        logp = dist_logp(out, batch["act"])
        ratio = jnp.exp(logp - batch["logp"])
        adv = batch["adv"]
        pg = -jnp.minimum(
            ratio * adv,
            jnp.clip(ratio, 1.0 - ppo.clip_eps, 1.0 + ppo.clip_eps) * adv,
        )
        w = batch["alive"]
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        v_err = value - batch["target"]
        v_loss = 0.5 * jnp.sum(v_err * v_err * w) / wsum
        ent = jnp.sum(dist_entropy(out) * w) / wsum
        loss = (
            jnp.sum(pg * w) / wsum
            + ppo.value_coef * v_loss
            - ppo.entropy_coef * ent
        )
        frac_clipped = (
            jnp.sum((jnp.abs(ratio - 1.0) > ppo.clip_eps).astype(jnp.float32) * w)
            / wsum
        )
        return loss, (v_loss, frac_clipped)

    def train_step(params, opt_state, states, counters, obs, rng):
        rng_roll, rng_perm = jax.random.split(rng)
        states, counters, obs, data = rollout(
            params, states, counters, obs, rng_roll
        )
        adv, target = compute_gae(
            data["reward"], data["value"], data["done"], data["last_value"],
            ppo.gamma, ppo.gae_lambda,
        )
        # env-major [E, T, ...] so minibatches are whole sequences and the
        # per-epoch shuffle is one contiguous row gather
        em = {
            "x": jnp.swapaxes(data["x"], 0, 1),
            "act": jnp.swapaxes(data["act"], 0, 1),
            "logp": jnp.swapaxes(data["logp"], 0, 1),
            "adv": jnp.swapaxes(adv, 0, 1),
            "target": jnp.swapaxes(target, 0, 1),
            "alive": jnp.swapaxes(data["alive"], 0, 1),
        }

        def run_epoch(carry, key):
            params, opt_state = carry
            perm = jax.random.permutation(key, B)

            def grab(v):  # [B, T, ...] -> [n_mb, (B/n_mb)*T, ...]
                shuffled = jnp.take(v, perm, axis=0)
                return shuffled.reshape(
                    (ppo.num_minibatches, (B // ppo.num_minibatches) * T)
                    + v.shape[2:]
                )

            mbs = jax.tree.map(grab, em)

            def run_mb(carry, mb):
                params, opt_state = carry
                # per-minibatch advantage normalization: alive-weighted
                # (frozen samples must not drag the stats) and global
                # across devices so replicas stay in lockstep
                a, w = mb["adv"], mb["alive"]
                wsum = jnp.maximum(_pmean(jnp.sum(w)), 1.0)
                mu = _pmean(jnp.sum(a * w)) / wsum
                var = _pmean(jnp.sum(w * (a - mu) ** 2)) / wsum
                mb = dict(mb, adv=(a - mu) * jax.lax.rsqrt(var + 1e-8))
                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, mb
                )
                grads = jax.tree.map(_pmean, grads)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, aux[0], aux[1])

            (params, opt_state), stats = jax.lax.scan(run_mb, (params, opt_state), mbs)
            return (params, opt_state), stats

        epoch_keys = jax.random.split(rng_perm, ppo.epochs)
        (params, opt_state), stats = jax.lax.scan(
            run_epoch, (params, opt_state), epoch_keys
        )
        go_f = data["game_over"].astype(jnp.float32)            # [T, E]
        live_raw = data["raw_reward"] * data["alive"]           # [T, B]
        metrics = {
            "loss": jnp.mean(stats[0]),
            "value_loss": jnp.mean(stats[1]),
            "clip_frac": jnp.mean(stats[2]),
            "mean_step_reward": _pmean(jnp.mean(live_raw)),
            "mean_shaped_reward": _pmean(jnp.mean(data["reward"] * data["alive"])),
            "episodes_finished": _pmean(jnp.sum(go_f)),
            # mean raw return per (learner, episode) among episodes that
            # finished inside this rollout (every env reset ends L
            # learner episodes)
            "mean_return_per_episode": _pmean(jnp.sum(live_raw))
            / jnp.maximum(_pmean(jnp.sum(go_f)) * L, 1.0),
        }
        return params, opt_state, states, counters, obs, metrics

    return train_step, init_fn, obs_dim


def make_sharded_ppo(
    ppo: PPOConfig,
    mesh,
    cfg: Optional[EnvConfig] = None,
    pool=None,
    **kwargs,
):
    """DP-PPO over a device mesh: one call that wires the shard_map.

    ``ppo.num_envs`` is the GLOBAL env count; it is split evenly over
    ``mesh``'s (single) axis.  Returns ``(train_step, init_fn, obs_dim)``
    with the same signatures as :func:`make_ppo` — ``init_fn`` builds the
    global carry (decorrelated scenario counters across all envs) and
    ``train_step`` is jitted ``shard_map`` with params/opt replicated,
    env leaves sharded, per-minibatch gradient/advantage-stat pmean.
    Used by scripts/train_ppo.py, scripts/scaling_bench.py, and the
    driver dryrun; equivalence with the unsharded update is asserted in
    tests/test_ppo.py.
    """
    from jax.sharding import PartitionSpec as PS

    from gym_collision_avoidance_tpu.parallel.distributed import shard_map

    (axis_name,) = mesh.axis_names
    D = int(np.prod(mesh.devices.shape))
    if ppo.num_envs % D:
        raise ValueError(f"num_envs {ppo.num_envs} not divisible by the "
                         f"{D}-device mesh")
    local = dataclasses.replace(ppo, num_envs=ppo.num_envs // D)
    tstep, _init_l, obs_dim = make_ppo(
        local, cfg=cfg, pool=pool, axis_name=axis_name, **kwargs
    )
    _tg, init_fn, _ = make_ppo(ppo, cfg=cfg, pool=pool, **kwargs)
    env_spec, rep = PS(axis_name), PS()
    train_step = jax.jit(
        shard_map(
            tstep, mesh=mesh,
            in_specs=(rep, rep, env_spec, env_spec, env_spec, rep),
            out_specs=(rep, rep, env_spec, env_spec, env_spec, rep),
            check_vma=False,
        )
    )
    return train_step, init_fn, obs_dim
