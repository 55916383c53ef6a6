"""Round-5 laserscan A/B: XLA staged kernel vs fused Pallas VMEM kernel.

The round-4 roofline (PERF.md) bounds the remaining laserscan headroom
at ~1.3x: the packed-field materialization is 17% of device time and
the compact select_reduce 69%.  ops/laser_pallas.py fuses screen +
compact + window + first-two-hit reduce in one VMEM kernel with no
[*, S, Lb] intermediates.  This script times both on the ga3c20_laser
bench configuration (C=9, W=12, Cs=4, empty map) and validates the
Pallas variant bitwise against the XLA path over the whole benched
trajectory (final states + per-step guard).  Exits 1 on mismatch.

Usage: python scripts/ab_laser_r5.py [--envs 256] [--steps 512]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from gym_collision_avoidance_tpu.maps import grid as map_grid
from gym_collision_avoidance_tpu.models import ga3c_cadrl
from gym_collision_avoidance_tpu.obs import sensors
from gym_collision_avoidance_tpu.scenarios import presets

from ab_laser_r4 import build, make_cfg


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=256)
    p.add_argument("--steps", type=int, default=512)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--pipeline", type=int, default=2)
    args = p.parse_args(argv)
    E, S = args.envs, args.steps

    sc = presets.circle_scenario(20, radius=8.0, agent_radius=0.3,
                                 policy="GA3C_CADRL")
    params = {"ga3c_cadrl": ga3c_cadrl.load_params()}
    cfg = make_cfg(9, 12, 4)  # the shipped ga3c20_laser fast-path knobs
    static_np = map_grid.load_static_map(cfg, None)
    cells = jnp.asarray(map_grid.occupied_cell_list(static_np))

    state0 = sc.to_state(cfg)
    states0 = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (E,) + x.shape), state0)

    finals = {}
    fail = False
    base_flag = sensors._WBC_PALLAS
    try:
        for name, flag in (("xla", False), ("pallas", True)):
            sensors._WBC_PALLAS = flag
            jax.clear_caches()  # inner-jit trace reuse (PERF.md r5)
            run = build(cfg, S, params, sc, cells)
            st, m = run(states0)  # compile + warmup
            jax.block_until_ready(st)
            if bool(jnp.any(m[1])):
                print(f"{name}: GUARD TRIPPED (exactness overflow)")
                fail = True
            finals[name] = st
            rates = []
            st = states0
            for _ in range(args.reps):
                t0 = time.perf_counter()
                for _p in range(args.pipeline):
                    st, m = run(st)
                jax.block_until_ready(st)
                rates.append(
                    args.pipeline * E * S / (time.perf_counter() - t0))
                if bool(jnp.any(m[1])):
                    print(f"{name}: GUARD TRIPPED mid-bench")
                    fail = True
            rates.sort()
            print(json.dumps({
                "variant": name,
                "env_steps_per_sec": round(rates[len(rates) // 2], 1),
                "spread_min": round(rates[0], 1),
                "spread_max": round(rates[-1], 1),
            }))
    finally:
        sensors._WBC_PALLAS = base_flag

    ok = all(jax.tree.leaves(jax.tree.map(
        lambda a, b: bool(jnp.array_equal(a, b, equal_nan=True)),
        finals["xla"], finals["pallas"])))
    print(f"bitwise state match xla vs pallas: {ok}")
    if fail or not ok:
        sys.exit("FAIL: mismatch or guard trip")


if __name__ == "__main__":
    main()
