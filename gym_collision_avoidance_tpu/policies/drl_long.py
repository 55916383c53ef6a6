"""DRL-Long internal policy kernel.

Wrapper semantics from ``DRLLongPolicy.find_next_action``
(envs/policies/DRLLongPolicy.py:61-119):

* laserscan normalized ``scan/6 - 0.5``; 3-deep stack, oldest frame first,
* goal rotated into the body frame,
* ``speed`` is the reference's quirk ``vel_x * [cos(h), sin(h)]`` (it uses
  only the x velocity component as the magnitude — replicated),
* network mean clipped to action_bound [[0,-1],[1,1]]
  (generate_action_no_sampling), omega converted via
  ``delta_heading = omega * DT``.

Requires ``cfg.use_static_map`` + the laserscan history in the state.
"""

from __future__ import annotations

import jax.numpy as jnp

from gym_collision_avoidance_tpu.models import drl_long as net
from gym_collision_avoidance_tpu.policies import registry

PARAMS_KEY = "drl_long"


def drl_long_kernel(state, cfg, params):
    if params is None or PARAMS_KEY not in params:
        raise ValueError(
            "DRL_LONG policy requires params['drl_long'] "
            "(models.drl_long.init_params() or convert_torch_state_dict)"
        )
    if state.laserscan_history.shape[-1] == 0:
        raise ValueError("DRL_LONG needs laserscan (cfg.use_static_map=True)")
    p = params[PARAMS_KEY]
    dtype = state.pos.dtype

    # history row 0 is newest; the net wants oldest first.
    scans = (state.laserscan_history[:, ::-1, :] / 6.0 - 0.5).astype(jnp.float32)

    dx = state.goal[:, 0] - state.pos[:, 0]
    dy = state.goal[:, 1] - state.pos[:, 1]
    c = jnp.cos(state.heading)
    s = jnp.sin(state.heading)
    goal_local = jnp.stack([dx * c + dy * s, -dx * s + dy * c], -1).astype(jnp.float32)

    speed = (
        state.vel[:, 0:1] * jnp.stack([c, s], -1)
    ).astype(jnp.float32)  # DRLLongPolicy.py:80 quirk

    mean = net.forward(p, scans, goal_local, speed)
    lo = jnp.asarray([0.0, -1.0], jnp.float32)
    hi = jnp.asarray([1.0, 1.0], jnp.float32)
    scaled = jnp.clip(mean, lo, hi)
    return jnp.stack(
        [scaled[:, 0].astype(dtype), (scaled[:, 1] * cfg.dt).astype(dtype)], -1
    )


DRL_LONG = 9
registry.POLICY_NAMES["drllong"] = DRL_LONG  # env_utils.py registry name
registry.register_internal(DRL_LONG, drl_long_kernel)
