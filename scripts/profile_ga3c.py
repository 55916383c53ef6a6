"""Profile the ga3c4 bench config on TPU and summarize the device trace."""

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
from gym_collision_avoidance_tpu.models import ga3c_cadrl
from gym_collision_avoidance_tpu.scenarios import presets

E, S = 1024, 32
cfg = EnvConfig(dtype="float32", max_num_other_agents_observed=19,
                agent_sorting_method="closest_last")
sc = presets.circle_scenario(4, radius=3.0, agent_radius=0.5, policy="GA3C_CADRL")
params = {"ga3c_cadrl": ga3c_cadrl.load_params()}

state = sc.to_state(cfg)
states = jax.tree.map(lambda x: jnp.broadcast_to(x, (E,) + x.shape), state)
active = sc.active_policies


def body(states, _):
    states, _o, rew, go, _i = batched_env_step(
        states, None, cfg, params, active, ("other_agents_states",),
        ("dist_to_goal",), None, None,
    )
    return states, (jnp.mean(rew), jnp.mean(go.astype(jnp.float32)))


@jax.jit
def run(states):
    return jax.lax.scan(body, states, None, length=S)


states, _ = run(states)
jax.block_until_ready(states)

outdir = "/tmp/ga3c_trace"
with jax.profiler.trace(outdir):
    states, _m = run(states)
    jax.block_until_ready(states)

t0 = time.perf_counter()
states, _m = run(states)
jax.block_until_ready(states)
dt = time.perf_counter() - t0
print(f"steady: {E * S / dt:.1f} env-steps/s")

files = glob.glob(outdir + "/**/*.trace.json.gz", recursive=True)
ev = json.load(gzip.open(sorted(files)[-1]))["traceEvents"]
dur = defaultdict(float)
for e in ev:
    if e.get("ph") == "X" and "dur" in e:
        name = e.get("name", "?")
        if len(name) < 120 and not name.startswith(("$", "Thread", "process")):
            dur[name] += e["dur"]
total = sum(dur.values())
for name, d in sorted(dur.items(), key=lambda kv: -kv[1])[:30]:
    print(f"{d/1e3:9.2f} ms  {100*d/max(total,1):5.1f}%  {name}")
