"""f32 end-to-end fuzz: the SERVING dtype, validated at env level.

Every BENCH row ships float32, but the golden/fuzz suites run f64
strict-parity — so an f32-only hazard (the round-4 lesson: a 1e-300
guard constant UNDERFLOWS TO ZERO in float32, turning a never-consumed
degenerate row into 0/0 = NaN that poisoned every slot through masked
sums, PERF.md) was invisible to CI and surfaced only through a changed
episode count.  This module closes that class at env level:

* seeded mixed-policy scenarios (drawing RVO + CADRL + GA3C-CADRL — the
  division-heavy kernels where guard constants live) stepped end-to-end
  in float32,
* asserted NaN/Inf-free on every trajectory array and final state leaf,
* discrete outcomes (at-goal / collision / timeout latches per step)
  EQUAL to the same engine's f64 rollout,
* continuous state within an f32-accumulation tolerance,
* plus the in-graph AUTORESET loop (reset injection is state surgery —
  the pool pick + select must be NaN-free and f32/f64-outcome-stable
  too), checked via equal episode counters and finite leaves.

The f64 side is this engine's own f64 path — itself golden-tested
bitwise/5e-4 against the reference (test_fuzz_golden, test_golden_vs_
reference) — so agreement here chains to reference behavior.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.core import dynamics as dyn
from gym_collision_avoidance_tpu.env import autoreset
from gym_collision_avoidance_tpu.env.step import env_reset
from gym_collision_avoidance_tpu.harness import runner
from gym_collision_avoidance_tpu.policies import registry as policies
from gym_collision_avoidance_tpu.scenarios import presets, random_cases

from tests.test_fuzz_golden import MAX_A, NN_STEPS, _random_nn_mix

F32_SEEDS = list(range(12))

# Same env knobs as the f64 NN fuzz (the GA3C checkpoint's registry
# sorting/slots), minus strict parity — f32 is the serving mode.
_CFG = dict(done_mode="learning", max_num_other_agents_observed=19,
            agent_sorting_method="closest_last")


def _rollout(mix, dtype):
    pos, goal, radius, pref_speed, heading, policy_id = mix
    from gym_collision_avoidance_tpu.models import cadrl as cadrl_net
    from gym_collision_avoidance_tpu.models import ga3c_cadrl

    cfg = EnvConfig(dtype=dtype, **_CFG)
    A = pos.shape[0]
    sc = presets.Scenario(
        pos=pos, goal=goal, pref_speed=pref_speed, radius=radius,
        heading=heading, policy_id=policy_id.astype(np.int32),
        dynamics_id=np.full(A, dyn.UNICYCLE, np.int32),
    ).pad_to(MAX_A)
    state, _ = env_reset(sc.to_state(cfg), cfg)
    params = {
        "cadrl": cadrl_net.load_params(dtype=jnp.dtype(dtype)),
        "ga3c_cadrl": ga3c_cadrl.load_params(dtype=jnp.dtype(dtype)),
    }
    final, traj = runner.rollout(
        state, cfg, NN_STEPS, params=params,
        active_policies=(policies.STATIC, policies.NONCOOP, policies.CADRL,
                         policies.GA3C_CADRL, policies.RVO),
    )
    return final, {k: np.asarray(v) for k, v in traj.items()}


@pytest.mark.parametrize("seed", F32_SEEDS)
def test_f32_env_fuzz_nan_free_and_outcome_stable(seed):
    mix = _random_nn_mix(seed)
    A = mix[0].shape[0]
    final32, t32 = _rollout(mix, "float32")
    _, t64 = _rollout(mix, "float64")

    # 1) NaN/Inf freedom everywhere f32 touched
    for k, v in t32.items():
        if np.issubdtype(v.dtype, np.floating):
            assert np.isfinite(v).all(), f"seed{seed}: non-finite in traj[{k}]"
    for leaf in jax.tree.leaves(final32):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating):
            assert np.isfinite(arr).all(), f"seed{seed}: non-finite state leaf"

    # 2) discrete outcomes equal to the f64 oracle, every step
    for key in ("is_at_goal", "in_collision", "ran_out_of_time"):
        np.testing.assert_array_equal(
            t32[key][:, :A], t64[key][:, :A], err_msg=f"seed{seed}:{key}"
        )

    # 3) continuous state within f32 accumulation tolerance
    for key in ("pos", "vel", "heading"):
        np.testing.assert_allclose(
            t32[key][:, :A].astype(np.float64), t64[key][:, :A], atol=2e-3,
            err_msg=f"seed{seed}:{key}",
        )


def _run_autoreset(pool, policy_id, active, dtype, E=8, S=150):
    cfg = EnvConfig(dtype=dtype, done_mode="evaluate")
    astep = autoreset.make_autoreset_step(
        cfg, jnp.asarray(pool, jnp.dtype(dtype)), policy_id,
        active_policies=active,
    )
    states = jax.vmap(
        lambda i: autoreset.state_from_case(
            cfg, jnp.asarray(pool, jnp.dtype(dtype))[i % pool.shape[0]],
            jnp.asarray(policy_id),
        )
    )(jnp.arange(E))

    def body(carry, _):
        st, c = carry
        st, c, obs, rew, go = jax.vmap(astep)(st, c)
        return (st, c), None

    (st, c), _ = jax.jit(
        lambda carry: jax.lax.scan(body, carry, None, length=S)
    )((states, jnp.arange(E, dtype=jnp.int32)))
    return st, np.asarray(c)


def _assert_finite_state(st, msg):
    for leaf in jax.tree.leaves(st):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating):
            assert np.isfinite(arr).all(), msg


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_f32_autoreset_fuzz_scripted(seed):
    """Autoreset in f32 with scripted (NonCoop/Static) mixes: finite
    states throughout AND per-env episode counters EXACTLY equal to the
    f64 loop after 150 steps (episode counts are the canary that caught
    the round-4 NaN).  Scripted policies have no knife-edge branches, so
    f32 rounding cannot legitimately change an episode's length here."""
    E = 8
    pool = random_cases.scenario_pool(8, 4, seed=100 + seed, side_length=4.0)
    rng = np.random.RandomState(300 + seed)
    policy_id = rng.choice([policies.NONCOOP, policies.STATIC], 4).astype(np.int32)
    policy_id[rng.randint(4)] = policies.NONCOOP  # someone must move
    active = tuple(sorted({int(p) for p in policy_id}))

    st32, c32 = _run_autoreset(pool, policy_id, active, "float32", E=E)
    _, c64 = _run_autoreset(pool, policy_id, active, "float64", E=E)
    _assert_finite_state(st32, f"seed{seed}: non-finite after autoreset")
    np.testing.assert_array_equal(
        c32, c64, err_msg=f"seed{seed}: f32 episode counters diverged from f64"
    )
    assert (c32 - np.arange(E)).sum() > 0, f"seed{seed}: no episodes completed"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_f32_autoreset_fuzz_rvo(seed):
    """Autoreset in f32 with ORCA in every episode — the kernel whose
    f32 guards bit in round 4.  ORCA holds genuine knife edges (an LP
    side-choice det crossing 0 picks between two equally valid
    velocities), so f32-vs-f64 episode counters may legitimately drift
    by a few episodes over 150 steps of resets: investigated for
    seed 2 — the divergence onsets as an O(0.1) velocity difference on
    an RVO agent at step 1 with every value finite, i.e. a flipped
    side choice, not a numeric defect.  The invariants that DO hold:
    NaN/Inf-freedom, every env completes episodes in both dtypes, and
    counters stay within a small band of f64."""
    E = 8
    pool = random_cases.scenario_pool(8, 4, seed=100 + seed, side_length=4.0)
    rng = np.random.RandomState(200 + seed)
    policy_id = rng.choice(
        [policies.NONCOOP, policies.RVO, policies.STATIC], 4
    ).astype(np.int32)
    policy_id[rng.randint(4)] = policies.RVO  # guarantee ORCA in the mix
    active = tuple(sorted({int(p) for p in policy_id}))

    st32, c32 = _run_autoreset(pool, policy_id, active, "float32", E=E)
    _, c64 = _run_autoreset(pool, policy_id, active, "float64", E=E)
    _assert_finite_state(st32, f"seed{seed}: non-finite after autoreset")
    eps32 = c32 - np.arange(E)
    eps64 = c64 - np.arange(E)
    assert (eps32 > 0).all() and (eps64 > 0).all(), f"seed{seed}: envs stalled"
    assert np.abs(eps32 - eps64).max() <= 2, (
        f"seed{seed}: f32 episode counts far from f64: {eps32} vs {eps64} — "
        "more than a knife-edge flip can explain; suspect an f32 defect"
    )
