"""Evaluate a trained DRL-Long-architecture net on the frozen suites.

The reference ships its DRL-Long policy BROKEN (empty submodule, no
checkpoint, "not fully working" — DRLLongPolicy.py:26).  This evaluates
the net `train_ppo.py --arch drl_long` trains from scratch on-device:
agent 0 runs the net GREEDILY (mean actions through the LearningPolicy
[0,1]^2 mapping — exactly the training-time action semantics), the
other agent(s) run ORCA/RVO, on the reference's frozen 500-case suites.
The learner observes the world ONLY through the 3-deep laserscan stack
plus polar goal + kinematic scalars.

Usage:
  python scripts/eval_drl_long.py results/drl_long_2ag_tpu.npz \
      [--agents 2] [--cases 500] [--steps 250] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--agents", type=int, default=2)
    ap.add_argument("--cases", type=int, default=500)
    ap.add_argument("--steps", type=int, default=250)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from gym_collision_avoidance_tpu.utils.jaxcache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from gym_collision_avoidance_tpu import EnvConfig
    from gym_collision_avoidance_tpu.env import autoreset
    from gym_collision_avoidance_tpu.env.batch import batched_env_step
    from gym_collision_avoidance_tpu.env.step import env_reset
    from gym_collision_avoidance_tpu.models import drl_long
    from gym_collision_avoidance_tpu.policies import registry as P
    from gym_collision_avoidance_tpu.scenarios import suites

    with np.load(args.ckpt) as z:
        params = {k: jnp.asarray(z[k]) for k in z.files}

    A = args.agents
    cfg = EnvConfig(dtype="float32", done_mode="evaluate",
                    use_static_map=True)
    L = cfg.laserscan_length
    cells = jnp.zeros((0, 2), jnp.int32)  # agents-only world
    sensors = ("laserscan",)
    keys = ("dist_to_goal", "heading_ego_frame", "pref_speed", "radius",
            "laserscan")

    cases = suites.load_full_test_suite(A, args.cases)
    pool = jnp.asarray(np.stack(cases[: args.cases]), jnp.float32)
    E = pool.shape[0]
    policy_id = jnp.asarray(
        np.array([P.LEARNING] + [P.RVO] * (A - 1), np.int32)
    )
    active = tuple(sorted({int(P.LEARNING), int(P.RVO)}))

    states = jax.jit(
        jax.vmap(lambda c: autoreset.state_from_case(cfg, c, policy_id)),
    )(pool)
    states, obs = jax.vmap(
        lambda s: env_reset(s, cfg, sensors, keys, None, cells)
    )(states)

    def act(obs):
        """Greedy learner action from the training obs layout."""
        scal = jnp.stack(
            [obs[k][:, 0, 0] for k in keys[:4]], axis=-1
        )                                                    # [E, 4]
        scan = obs["laserscan"][:, 0] / 6.0 - 0.5            # [E, 3, L]
        mean, _ls, _v = drl_long.forward_actor_critic(
            params, scan, scal[:, 0:2], scal[:, 2:4]
        )
        ext0 = mean.astype(jnp.float32)                      # [E, 2]
        return jnp.concatenate(
            [ext0[:, None, :], jnp.zeros((E, A - 1, 2), jnp.float32)],
            axis=1,
        )

    def body(carry, _):
        st, obs = carry
        st, obs, rew, go, _info = batched_env_step(
            st, act(obs), cfg, None, active, sensors, keys, None, cells
        )
        return (st, obs), None

    @jax.jit
    def run(carry):
        return jax.lax.scan(body, carry, None, length=args.steps)

    (final, _obs), _ = run((states, obs))
    jax.block_until_ready(final.pos)

    at_goal = np.asarray(final.is_at_goal[:, 0])
    coll = np.asarray(final.was_in_collision_already[:, 0])
    timeout = np.asarray(final.ran_out_of_time[:, 0])
    success = at_goal & ~coll
    print(
        f"{os.path.basename(args.ckpt)} on the frozen {A}-agent "
        f"{E}-case suite (learner=greedy DRL-Long net, others=RVO):"
    )
    print(
        f"  success {100*success.mean():.1f}%  collision "
        f"{100*coll.mean():.1f}%  timeout/stuck "
        f"{100*(timeout & ~coll & ~at_goal).mean():.1f}%"
    )
    return True


if __name__ == "__main__":
    main()
