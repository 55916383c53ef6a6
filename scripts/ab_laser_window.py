"""A/B the windowed per-source laserscan against the shipped wedge path.

VERDICT r2 item 4: the per-source first-two-hit decomposition
(obs/sensors.py:_windowed_first_two_hits, cfg.laserscan_entry_window)
was built in round 2 but never measured at full 20-agent scale at the
official S=128 dispatch size.  This script runs the exact ga3c20_laser
bench configuration (bench_all.py:bench_ga3c20_laser — E=256 envs,
20 agents, static 20x20 m map, GA3C-CADRL policy) under each laserscan
variant, validates bit-identity of the full end state between variants,
and reports env-steps/s.

Variants:
  base        C=10 wedge culling, full R=60 range axis (shipped)
  win<W>      C=10 wedge culling + W-sample entry windows
  win<W>_nw   W-sample entry windows, no wedge culling (all 20 discs)

The window size is validated two ways: laserscan_window_span on the
evolving trajectory (the sufficient analytic bound), and a bitwise
state comparison between variants after the full dispatch.

Usage: python scripts/ab_laser_window.py [--envs 256] [--steps 128]
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


def make_cfg(candidates, window):
    return EnvConfig(dtype="float32", max_num_other_agents_observed=19,
                     agent_sorting_method="closest_last",
                     use_static_map=True,
                     map_x_width=20.0, map_y_width=20.0,
                     laserscan_num_candidate_discs=candidates,
                     laserscan_entry_window=window)


def build(cfg, E, S, params, sc, cells):
    active = sc.active_policies

    def body(states, _):
        states, _o, rew, go, _i = batched_env_step(
            states, None, cfg, params, active, SENSORS, ("dist_to_goal",),
            None, cells,
        )
        return states, (jnp.mean(rew), jnp.mean(go.astype(jnp.float32)))

    @jax.jit
    def run(states):
        return jax.lax.scan(body, states, None, length=S)

    return run


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=256)
    p.add_argument("--steps", type=int, default=128)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--window", type=int, default=None,
                   help="entry-window samples (default: measured span + 2)")
    p.add_argument("--trace", default=None,
                   help="write a profiler trace of the best variant here")
    args = p.parse_args(argv)
    E, S = args.envs, args.steps

    sc = presets.circle_scenario(20, radius=8.0, agent_radius=0.3,
                                 policy="GA3C_CADRL")
    params = {"ga3c_cadrl": ga3c_cadrl.load_params()}
    cfg0 = make_cfg(10, None)
    static_np = map_grid.load_static_map(cfg0, None)
    cells = jnp.asarray(map_grid.occupied_cell_list(static_np))
    print(f"static occupied cells: {cells.shape[0]}")

    state0 = sc.to_state(cfg0)
    states0 = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (E,) + x.shape), state0)

    # --- window-span validation over the trajectory the bench runs ---
    run_base = build(cfg0, E, S, params, sc, cells)
    st = states0
    max_span = sensors.laserscan_window_span(state0, cfg0, cells)
    for chunk in range(4):  # warmup + 3 reps worth of trajectory
        st, _ = run_base(st)
        env0 = jax.tree.map(lambda x: x[0], st)
        max_span = max(max_span,
                       sensors.laserscan_window_span(env0, cfg0, cells))
    print(f"max window span over {4 * S} steps: {max_span}")
    W = args.window if args.window is not None else max_span + 2

    variants = [
        ("base", make_cfg(10, None)),
        (f"win{W}", make_cfg(10, W)),
        (f"win{W}_nw", make_cfg(None, W)),
    ]

    finals = {}
    results = []
    for name, cfg in variants:
        run = build(cfg, E, S, params, sc, cells)
        st, _ = run(states0)  # compile + warmup
        jax.block_until_ready(st)
        finals[name] = st
        rates = []
        st = states0
        for _ in range(args.reps):
            t0 = time.perf_counter()
            st, _m = run(st)
            jax.block_until_ready(st)
            rates.append(E * S / (time.perf_counter() - t0))
        rates.sort()
        row = {"variant": name, "env_steps_per_sec": round(rates[len(rates) // 2], 1),
               "spread_min": round(rates[0], 1), "spread_max": round(rates[-1], 1)}
        results.append(row)
        print(json.dumps(row))

    # --- bitwise equality of the post-dispatch state across variants ---
    ref = finals["base"]
    any_mismatch = False
    for name, _cfg in variants[1:]:
        leaves_ok = jax.tree.map(
            lambda a, b: bool(jnp.array_equal(a, b, equal_nan=True)),
            ref, finals[name])
        ok = all(jax.tree.leaves(leaves_ok))
        print(f"bitwise state match base vs {name}: {ok}")
        if not ok:
            any_mismatch = True
            bad = [k for k, v in zip(
                [str(i) for i in range(len(jax.tree.leaves(leaves_ok)))],
                jax.tree.leaves(leaves_ok)) if not v]
            print(f"  mismatched leaf positions: {bad}")

    if args.trace:
        best = min(results, key=lambda r: -r["env_steps_per_sec"])
        cfgb = dict(variants)[best["variant"]]
        run = build(cfgb, E, S, params, sc, cells)
        st, _ = run(states0)
        jax.block_until_ready(st)
        with jax.profiler.trace(args.trace):
            st, _ = run(st)
            jax.block_until_ready(st)
        print(f"trace of {best['variant']} written to {args.trace}")

    if any_mismatch:
        sys.exit("FAIL: a windowed variant's final state differs bitwise "
                 "from the base path")


if __name__ == "__main__":
    main()
