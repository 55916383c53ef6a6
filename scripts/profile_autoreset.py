"""Profile the autoreset4 bench config on TPU and summarize the trace.

Usage: profile_autoreset.py [E] [S] — defaults 4096 64; the round-5
headline roofline ran it at the bench's E=16384 (S=128: the scan body is
the same program at any length, so per-step device-time fractions match
the S=1024 headline while the trace stays tractable).
"""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from gym_collision_avoidance_tpu import EnvConfig
from gym_collision_avoidance_tpu.env import autoreset
from gym_collision_avoidance_tpu.policies import registry as P
from gym_collision_avoidance_tpu.scenarios import random_cases

E = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
S = int(sys.argv[2]) if len(sys.argv) > 2 else 64
cfg = EnvConfig(dtype="float32", done_mode="evaluate")
pool = jnp.asarray(random_cases.scenario_pool(64, 4, seed=0, side_length=4.0),
                   jnp.float32)
policy_id = np.full(4, P.NONCOOP, np.int32)
astep = autoreset.make_autoreset_step(cfg, pool, policy_id)

states = jax.vmap(
    lambda i: autoreset.state_from_case(cfg, pool[i % 64], policy_id)
)(jnp.arange(E))
counters = jnp.arange(E, dtype=jnp.int32)


def body(carry, _):
    st, c = carry
    st, c, obs, rew, go = jax.vmap(astep)(st, c)
    return (st, c), (jnp.mean(rew), jnp.sum(obs["dist_to_goal"]))


@jax.jit
def run(carry):
    return jax.lax.scan(body, carry, None, length=S)


carry = (states, counters)
compiled = run.lower(carry).compile()
hlo_text = compiled.as_text()
carry, _ = run(carry)
jax.block_until_ready(carry[0])

outdir = "/tmp/areset_trace"
with jax.profiler.trace(outdir):
    carry, _m = run(carry)
    jax.block_until_ready(carry[0])

t0 = time.perf_counter()
carry, _m = run(carry)
jax.block_until_ready(carry[0])
dt = time.perf_counter() - t0
print(f"steady (single blocking dispatch): {E * S / dt:.1f} env-steps/s")

from gym_collision_avoidance_tpu.utils import traceattr

traceattr.print_report(outdir, hlo_text, steps=S, envs=E)
