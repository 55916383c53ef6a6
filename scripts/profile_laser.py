"""Profile the ga3c20_laser bench config on TPU: one traced run, then
summarize the device trace's top ops (see PERF.md for findings)."""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.env.batch import batched_env_step
from gym_collision_avoidance_tpu.maps import grid as map_grid
from gym_collision_avoidance_tpu.models import ga3c_cadrl
from gym_collision_avoidance_tpu.scenarios import presets

E, S = 256, 32
_C = int(sys.argv[1]) if len(sys.argv) > 1 else None
_W = int(sys.argv[2]) if len(sys.argv) > 2 else None
_S = int(sys.argv[3]) if len(sys.argv) > 3 else None
cfg = EnvConfig(dtype="float32", max_num_other_agents_observed=19,
                agent_sorting_method="closest_last", use_static_map=True,
                map_x_width=20.0, map_y_width=20.0,
                laserscan_num_candidate_discs=_C or None,
                laserscan_entry_window=_W or None,
                laserscan_beam_slots=_S or None)
sc = presets.circle_scenario(20, radius=8.0, agent_radius=0.3, policy="GA3C_CADRL")
params = {"ga3c_cadrl": ga3c_cadrl.load_params()}
static_np = map_grid.load_static_map(cfg, None)
cells = jnp.asarray(map_grid.occupied_cell_list(static_np))

state = sc.to_state(cfg)
states = jax.tree.map(lambda x: jnp.broadcast_to(x, (E,) + x.shape), state)
active = sc.active_policies
sensors = ("other_agents_states", "laserscan")


def body(states, _):
    states, _o, rew, go, info = batched_env_step(
        states, None, cfg, params, active, sensors, ("dist_to_goal",),
        None, cells,
    )
    # consume the exactness flag so the traced graph matches the shipped
    # serving loop (an unused flag would be DCE'd out of the profile)
    ovf = info.get("laserscan_exactness_overflow", jnp.asarray(False))
    return states, (jnp.mean(rew), jnp.mean(go.astype(jnp.float32)),
                    jnp.any(ovf))


@jax.jit
def run(states):
    return jax.lax.scan(body, states, None, length=S)


states, _ = run(states)
jax.block_until_ready(states)

outdir = "/tmp/laser_trace"
with jax.profiler.trace(outdir):
    states, _m = run(states)
    jax.block_until_ready(states)

t0 = time.perf_counter()
states, _m = run(states)
jax.block_until_ready(states)
dt = time.perf_counter() - t0
print(f"steady: {E * S / dt:.1f} env-steps/s")

# summarize trace
files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
ev = json.load(gzip.open(sorted(files)[-1]))["traceEvents"]
dur = defaultdict(float)
for e in ev:
    if e.get("ph") == "X" and "dur" in e:
        cat = e.get("args", {}) or {}
        name = e.get("name", "?")
        pid = e.get("pid", 0)
        # device ops live on TensorFlow-op-named tracks; host python rows
        # are huge and uninteresting — keep short op names only
        if len(name) < 120 and not name.startswith(("$", "Thread", "process")):
            dur[name] += e["dur"]
total = sum(dur.values())
for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{d/1e3:9.2f} ms  {100*d/max(total,1):5.1f}%  {name}")
