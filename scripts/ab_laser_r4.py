"""Round-4 laserscan A/B: window size, candidate count, tile layout.

Sweeps the ga3c20_laser bench configuration (bench_all.py) over the
round-4 levers:

  - empty static-cell list (the 20x20 default map has ZERO occupied
    cells; round 3 still paid a full [A, Wn, 1, Lb] pass for one
    all-padding row),
  - candidate count C (the scenario's wedge counts peak at 8),
  - entry window W (the scenario's span peaks at 12),
  - window-axis tile layout (obs.sensors._WN_SUBLANE: window axis vs
    source axis in sublane position).

Every variant runs the in-graph exactness guard (it ships in env_step)
and is validated bitwise against the full-range-axis base after the
whole dispatch.  Exits 1 on any mismatch or guard trip.

Usage: python scripts/ab_laser_r4.py [--envs 256] [--steps 128]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.env.batch import batched_env_step
from gym_collision_avoidance_tpu.maps import grid as map_grid
from gym_collision_avoidance_tpu.models import ga3c_cadrl
from gym_collision_avoidance_tpu.obs import sensors
from gym_collision_avoidance_tpu.scenarios import presets

SENSORS = ("other_agents_states", "laserscan")


def make_cfg(candidates, window, beam_slots=None):
    return EnvConfig(dtype="float32", max_num_other_agents_observed=19,
                     agent_sorting_method="closest_last",
                     use_static_map=True,
                     map_x_width=20.0, map_y_width=20.0,
                     laserscan_num_candidate_discs=candidates,
                     laserscan_entry_window=window,
                     laserscan_beam_slots=beam_slots)


def build(cfg, S, params, sc, cells):
    active = sc.active_policies

    def body(states, _):
        states, _o, rew, go, info = batched_env_step(
            states, None, cfg, params, active, SENSORS, ("dist_to_goal",),
            None, cells,
        )
        ovf = info.get("laserscan_exactness_overflow", jnp.asarray(False))
        return states, (jnp.mean(rew), jnp.any(ovf))

    @jax.jit
    def run(states):
        return jax.lax.scan(body, states, None, length=S)

    return run


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=256)
    p.add_argument("--steps", type=int, default=128)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--variants", default=None,
                   help="comma list like 'C8W14L1,C10W14L0' to restrict")
    args = p.parse_args(argv)
    E, S = args.envs, args.steps

    sc = presets.circle_scenario(20, radius=8.0, agent_radius=0.3,
                                 policy="GA3C_CADRL")
    params = {"ga3c_cadrl": ga3c_cadrl.load_params()}
    cfg0 = make_cfg(10, None)
    static_np = map_grid.load_static_map(cfg0, None)
    cells = jnp.asarray(map_grid.occupied_cell_list(static_np))
    print(f"static occupied cells: {cells.shape[0]} (natural length)")

    state0 = sc.to_state(cfg0)
    states0 = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (E,) + x.shape), state0)

    # (name, C, W, wn_sublane)
    all_variants = [
        ("base", 10, None, False),           # full range axis, r3 wedge
        ("C10W14L0", 10, 14, False),         # r3 shipped (minus pad cell)
        ("C8W14L0", 8, 14, False),
        ("C8W12L0", 8, 12, False),
        ("C10W14L1", 10, 14, True),
        ("C8W14L1", 8, 14, True),
        ("C8W16L1", 8, 16, True),            # same tile footprint as W=9..16
        ("CnoneW14L1", None, 14, True),      # windows without wedge
        ("C10W12L0", 10, 12, False),
        ("C9W12L0", 9, 12, False),
        ("C8W12L1", 8, 12, True),
        ("C8W13L0", 8, 13, False),
        ("C12W12L0", 12, 12, False),
        # per-beam source compaction (4th field = beam slots)
        ("C9W12S4", 9, 12, False, 4),
        ("C8W12S4", 8, 12, False, 4),
        ("C10W12S4", 10, 12, False, 4),
        ("C9W12S4E512", 9, 12, False, 4),
        ("C9W12S5", 9, 12, False, 5),
        ("C9W12S6", 9, 12, False, 6),
        ("CnoneW12S5", None, 12, False, 5),
        ("CnoneW12S6", None, 12, False, 6),
        # folded Cs*Wn axis in the beam-compacted window pass
        ("C9W12S4F", 9, 12, False, 4, True),
        ("C9W12S3F", 9, 12, False, 3, True),
        ("C10W12S4F", 10, 12, False, 4, True),
    ]
    if args.variants:
        keep = {"base"} | set(args.variants.split(","))
        all_variants = [v for v in all_variants if v[0] in keep]

    finals, results = {}, []
    fail = False
    sublane0, fold0 = sensors._WN_SUBLANE, sensors._FOLD_CW
    try:
        for name, C, W, lay, *rest in all_variants:
            sensors._WN_SUBLANE = lay
            sensors._FOLD_CW = len(rest) > 1 and rest[1]
            cfg = make_cfg(C, W, rest[0] if rest else None)
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
                st, m = run(st)
                jax.block_until_ready(st)
                rates.append(E * S / (time.perf_counter() - t0))
                if bool(jnp.any(m[1])):
                    print(f"{name}: GUARD TRIPPED mid-bench")
                    fail = True
            rates.sort()
            row = {"variant": name,
                   "env_steps_per_sec": round(rates[len(rates) // 2], 1),
                   "spread_min": round(rates[0], 1),
                   "spread_max": round(rates[-1], 1)}
            results.append(row)
            print(json.dumps(row))
    finally:
        # restore BOTH module globals for any in-process caller
        sensors._WN_SUBLANE, sensors._FOLD_CW = sublane0, fold0

    ref = finals["base"]
    for name in finals:
        if name == "base":
            continue
        ok = all(jax.tree.leaves(jax.tree.map(
            lambda a, b: bool(jnp.array_equal(a, b, equal_nan=True)),
            ref, finals[name])))
        print(f"bitwise state match base vs {name}: {ok}")
        if not ok:
            fail = True

    if fail:
        sys.exit("FAIL: mismatch or guard trip")


if __name__ == "__main__":
    main()
