"""Policy registry and batched dispatch.

The reference wires a Policy *object* into each Agent and branches in
Python (``envs/collision_avoidance_env.py:310-323``).  Here every policy is
a pure batched kernel ``(state, cfg, params) -> [A, 2] actions`` computed
for *all* agents, and the per-agent choice is a masked select over an
integer ``policy_id`` array — the TPU idiom (compute-everything-select).

Only the policies actually present in a scenario are compiled in: the step
function takes a static tuple ``active_policies`` so XLA never materializes
kernels for absent policies (important because e.g. the CADRL lookahead is
~100x the cost of NonCoop).
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

# -- policy type ids (state.policy_id values) -------------------------------
EXTERNAL = 0       # envs/policies/ExternalPolicy.py (identity passthrough)
STATIC = 1         # envs/policies/StaticPolicy.py
NONCOOP = 2        # envs/policies/NonCooperativePolicy.py
LEARNING = 3       # envs/policies/LearningPolicy.py (external, continuous)
LEARNING_GA3C = 4  # envs/policies/LearningPolicyGA3C.py (external, discrete)
CARRL = 5          # envs/policies/CARRLPolicy.py (external, discrete)
GA3C_CADRL = 6     # envs/policies/GA3CCADRLPolicy.py (internal NN)
CADRL = 7          # envs/policies/CADRLPolicy.py (internal NN + lookahead)
RVO = 8            # envs/policies/RVOPolicy.py (internal ORCA)

POLICY_NAMES: Mapping[str, int] = {
    # reference registry names (envs/test_cases.py:68-88)
    "external": EXTERNAL,
    "static": STATIC,
    "noncoop": NONCOOP,
    "learning": LEARNING,
    "learning_ga3c": LEARNING_GA3C,
    "carrl": CARRL,
    "GA3C_CADRL": GA3C_CADRL,
    "CADRL": CADRL,
    "RVO": RVO,
}

# Policies that receive their action from the caller of env_step
# (is_external=True in the reference, envs/policies/ExternalPolicy.py:12).
EXTERNAL_POLICIES = (EXTERNAL, LEARNING, LEARNING_GA3C, CARRL)

# Policies whose obs field is_learning == 1 (policy.str == "learning",
# envs/config.py:162 + LearningPolicy.__init__).
LEARNING_POLICIES = (LEARNING, LEARNING_GA3C)

# Policies with is_still_learning=True (used for the "learning" done mode,
# envs/collision_avoidance_env.py:545-551).
STILL_LEARNING_POLICIES = (LEARNING, LEARNING_GA3C)


def ga3c_actions_table(dtype=np.float64) -> np.ndarray:
    """The 11-entry discrete action grid of GA3C-CADRL.

    Mirrors ``network.Actions`` (envs/policies/GA3C_CADRL/network.py:7-16):
    [1.0  x {-pi/6, -pi/12, 0, pi/12, pi/6}],
    [0.5  x {-pi/6, 0, pi/6}],
    [0.0  x {-pi/6, 0, pi/6}].
    """
    a = np.mgrid[1.0:1.1:0.5, -np.pi / 6:np.pi / 6 + 0.01:np.pi / 12].reshape(2, -1).T
    a = np.vstack([a, np.mgrid[0.5:0.6:0.5, -np.pi / 6:np.pi / 6 + 0.01:np.pi / 6].reshape(2, -1).T])
    a = np.vstack([a, np.mgrid[0.0:0.1:0.5, -np.pi / 6:np.pi / 6 + 0.01:np.pi / 6].reshape(2, -1).T])
    return a.astype(dtype)


def carrl_actions_table(dtype=np.float64) -> np.ndarray:
    """11 actions, speed 1, heading in linspace(-pi/6, pi/6, 11)
    (envs/policies/CARRLPolicy.py:13-18)."""
    a = np.zeros((11, 2), dtype=dtype)
    a[:, 0] = 1.0
    a[:, 1] = np.linspace(-np.pi / 6, np.pi / 6, 11)
    return a


# -- internal policy kernels ------------------------------------------------

def noncoop_kernel(state, cfg, params):
    """Straight to goal at pref speed
    (envs/policies/NonCooperativePolicy.py:21)."""
    del cfg, params
    return jnp.stack([state.pref_speed, -state.heading_ego_frame], axis=-1)


def static_kernel(state, cfg, params):
    """Zero action (envs/policies/StaticPolicy.py:21-22).  The goal-pinning
    side effect (goal := pos) is applied by the step function."""
    del cfg, params
    return jnp.zeros((state.pos.shape[0], 2), state.pos.dtype)


# -- external action mappers (external_action_to_action) --------------------

def map_external_actions(state, ext_actions, cfg):
    """Convert caller-provided external actions to (speed, delta-heading).

    ``ext_actions`` is [A, 2] float.  For the discrete external policies
    (LEARNING_GA3C, CARRL) the action index is ``ext_actions[:, 0]`` cast to
    int.  Per-policy semantics:

    * EXTERNAL: identity (ExternalPolicy.external_action_to_action).
    * LEARNING: speed = pref_speed * a0,
      dheading = max_heading_change * (2*a1 - 1)  (LearningPolicy.py:31-33).
    * LEARNING_GA3C: table lookup, speed scaled by pref_speed
      (LearningPolicyGA3C.py:25-27).
    * CARRL: plain table lookup (CARRLPolicy.py:31).
    """
    dtype = state.pos.dtype
    pid = state.policy_id
    ext = jnp.asarray(ext_actions, dtype)

    out = ext  # EXTERNAL identity default

    learn = jnp.stack(
        [
            state.pref_speed * ext[..., 0],
            cfg.max_heading_change * (2.0 * ext[..., 1] - 1.0),
        ],
        axis=-1,
    )
    out = jnp.where((pid == LEARNING)[..., None], learn, out)

    idx = jnp.clip(ext[..., 0].astype(jnp.int32), 0, 10)
    ga3c_table = jnp.asarray(ga3c_actions_table(), dtype)
    ga3c = ga3c_table[idx]
    ga3c = jnp.stack([ga3c[..., 0] * state.pref_speed, ga3c[..., 1]], axis=-1)
    out = jnp.where((pid == LEARNING_GA3C)[..., None], ga3c, out)

    carrl_table = jnp.asarray(carrl_actions_table(), dtype)
    out = jnp.where((pid == CARRL)[..., None], carrl_table[idx], out)
    return out


# -- dispatch ---------------------------------------------------------------

# name -> kernel for internal policies available in this round.
# GA3C_CADRL / CADRL / RVO kernels are registered by their modules on import
# (see policies/ga3c_cadrl, policies/cadrl, policies/orca).
INTERNAL_KERNELS = {
    STATIC: static_kernel,
    NONCOOP: noncoop_kernel,
}


def register_internal(policy_id: int, kernel) -> None:
    INTERNAL_KERNELS[policy_id] = kernel


def compute_actions(state, ext_actions, cfg, params, active_policies):
    """Compute the [A, 2] action array for every agent.

    Mirrors ``CollisionAvoidanceEnv._take_action``'s selection loop
    (envs/collision_avoidance_env.py:309-323): done agents keep a zero
    action (they're frozen inside take-action anyway), external agents get
    their mapped external action, internal agents query their policy kernel.

    Args:
        active_policies: static tuple of policy ids present in this scenario;
            only these kernels are traced/compiled.
    """
    A = state.pos.shape[0]
    dtype = state.pos.dtype
    actions = jnp.zeros((A, 2), dtype)

    if any(p in EXTERNAL_POLICIES for p in active_policies):
        if ext_actions is None:
            raise ValueError("scenario contains external policies but no actions given")
        mapped = map_external_actions(state, ext_actions, cfg)
        is_ext = _isin(state.policy_id, [p for p in active_policies if p in EXTERNAL_POLICIES])
        actions = jnp.where(is_ext[:, None], mapped, actions)

    for pid in active_policies:
        if pid in EXTERNAL_POLICIES:
            continue
        kernel = INTERNAL_KERNELS.get(pid)
        if kernel is None:
            raise NotImplementedError(f"internal policy id {pid} has no kernel registered")
        pol_actions = kernel(state, cfg, params)
        actions = jnp.where((state.policy_id == pid)[:, None], pol_actions, actions)

    # Done agents contribute a zero action
    # (envs/collision_avoidance_env.py:311-312).
    actions = jnp.where(state.is_done[:, None], 0.0, actions)
    return actions


def compute_actions_batched(states, ext_actions, cfg, params, active_policies):
    """Batched-env action computation over [E, A]-leaved states.

    Mathematically identical to vmapping :func:`compute_actions` over envs,
    but NN policies (GA3C_CADRL, CADRL, DRL_LONG) run their network ONCE on
    the flattened agent batch — per-env vmapped matmuls of [A, K] are tiny
    batched dots that serialize the MXU and cost ~100x.
    """
    import jax

    E, A = states.pos.shape[:2]
    dtype = states.pos.dtype
    actions = jnp.zeros((E, A, 2), dtype)

    if any(p in EXTERNAL_POLICIES for p in active_policies):
        if ext_actions is None:
            raise ValueError("scenario contains external policies but no actions given")
        mapped = map_external_actions(states, ext_actions, cfg)
        is_ext = _isin(states.policy_id, [p for p in active_policies if p in EXTERNAL_POLICIES])
        actions = jnp.where(is_ext[..., None], mapped, actions)

    for pid in active_policies:
        if pid in EXTERNAL_POLICIES:
            continue
        if pid == STATIC:
            pol_actions = jnp.zeros((E, A, 2), dtype)
        elif pid == NONCOOP:
            pol_actions = noncoop_kernel(states, cfg, params)  # elementwise
        elif pid == GA3C_CADRL:
            from gym_collision_avoidance_tpu.policies.ga3c import (
                ga3c_cadrl_kernel_batched,
            )

            pol_actions = ga3c_cadrl_kernel_batched(states, cfg, params)
        elif pid == CADRL:
            from gym_collision_avoidance_tpu.policies.cadrl import (
                cadrl_kernel_batched,
            )

            pol_actions = cadrl_kernel_batched(states, cfg, params)
        else:
            kernel = INTERNAL_KERNELS.get(pid)
            if kernel is None:
                raise NotImplementedError(f"internal policy id {pid} has no kernel")
            pol_actions = jax.vmap(lambda s: kernel(s, cfg, params))(states)
        actions = jnp.where((states.policy_id == pid)[..., None], pol_actions, actions)

    actions = jnp.where(states.is_done[..., None], 0.0, actions)
    return actions


def _isin(arr, values):
    mask = jnp.zeros(arr.shape, bool)
    for v in values:
        mask = mask | (arr == v)
    return mask
