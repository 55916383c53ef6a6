"""Static environment configuration.

Replaces the reference's mutable, env-var-selected singleton config
(``/root/reference/gym_collision_avoidance/envs/config.py:3-304`` and
``envs/__init__.py:4-18``) with a frozen, hashable dataclass that is passed
to jitted functions as a *static* argument, so XLA specializes the compiled
step for each configuration.

The observation layout is declared in
:mod:`gym_collision_avoidance_tpu.obs.spec` (the reference declares it as
``STATE_INFO_DICT`` attr-accessor strings evaluated with ``eval``,
``envs/config.py:93-170`` + ``envs/agent.py:323-327``; we compile it into a
fixed pytree layout instead).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


# Agent-sorting methods for the other-agents sensor
# (reference: envs/config.py:173-175).
SORT_CLOSEST_FIRST = "closest_first"
SORT_CLOSEST_LAST = "closest_last"
SORT_TIME_TO_IMPACT = "time_to_impact"

# Episode-termination ("game over") modes
# (reference: envs/collision_avoidance_env.py:538-551).
DONE_MODE_EVALUATE = "evaluate"        # all agents done
DONE_MODE_SINGLE_AGENT = "single"      # agent 0 done
DONE_MODE_LEARNING = "learning"        # all still-learning agents done


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """All static knobs of the simulation.

    Defaults mirror the reference base ``Config``
    (``envs/config.py:29-86``); evaluation presets are provided as
    constructors below (mirroring ``EvaluateConfig`` etc.,
    ``envs/config.py:193-285``).
    """

    # --- simulation (envs/config.py:44-47) ---
    dt: float = 0.2
    near_goal_threshold: float = 0.2
    max_time_ratio: float = 2.0

    # --- rewards (envs/config.py:29-39) ---
    reward_at_goal: float = 1.0
    reward_collision_with_agent: float = -0.25
    reward_collision_with_wall: float = -0.25
    reward_getting_close: float = -0.1
    reward_time_step: float = 0.0
    reward_wiggly_behavior: float = 0.0
    wiggly_behavior_threshold: float = np.inf
    collision_dist: float = 0.0
    getting_close_range: float = 0.2

    # --- sensing (envs/config.py:76-80) ---
    sensing_horizon: float = np.inf
    max_num_other_agents_observed: int = 3
    agent_sorting_method: str = SORT_CLOSEST_FIRST
    laserscan_length: int = 512
    laserscan_num_past: int = 3
    # Optional per-128-beam-block disc culling for the sparse laserscan:
    # each beam block only tests the <= C discs whose inflated tangent cone
    # overlaps its angular span (exact-conservative screen).  None = test
    # every disc.  Bit-identical to the full path as long as no
    # (ego, block) ever has more than C screened candidates — check with
    # obs.sensors.laserscan_wedge_candidate_counts before trusting a C for
    # a new scenario family (the 20-agent benchmark scenario peaks at 8).
    laserscan_num_candidate_discs: int | None = None
    # Optional windowed first-two-hits evaluation for the sparse laserscan:
    # instead of testing every (disc, range-sample, beam) triple, each
    # disc/static-cell is tested only on a W-sample window starting just
    # before its analytic entry range along each beam.  The reference's
    # cumsum==1 scan rule depends only on the FIRST TWO hit indices per
    # beam, and both provably lie inside a window that covers the
    # quantization band around the disc boundary (half-width sqrt(2)
    # cells, from the per-coordinate floor error bound) plus one
    # guaranteed-interior sample.  None = evaluate the full range axis.
    # Identical to the full path as long as no (ego, disc, beam) needs a
    # span larger than W — check with obs.sensors.laserscan_window_span
    # before trusting a W for a new scenario family (radius-0.3 m agents
    # on a 0.1 m grid need at most 12; the 20-agent benchmark scenario
    # measures 11).  CONTRACT: both this and laserscan_num_candidate_discs
    # are conditionally exact, and the condition is checked IN-GRAPH every
    # step — env_step's info carries "laserscan_exactness_overflow", True
    # on any step whose ranges may diverge from the full pass (see
    # obs.sensors.laserscan_sparse(return_overflow=True)).  Consumers that
    # bypass env_step's info (custom rollers) must check the flag
    # themselves; scripts/bench_all.py aborts the run on any overflow.
    laserscan_entry_window: int | None = None
    # Optional per-BEAM source compaction for the windowed sparse
    # laserscan (requires laserscan_entry_window): before the window
    # pass, each beam keeps only the <= Cs sources whose inflated
    # analytic band the beam's sample range crosses (a source outside
    # its band can produce no cell-quantized hit — the same argument
    # that bounds the entry window).  The 20-agent benchmark scenario
    # never exceeds 4 band-overlapping sources per beam while testing
    # 9-10 block-level wedge candidates on every beam.  Conditionally
    # exact like the other two knobs, guarded by the same in-graph
    # "laserscan_exactness_overflow" flag (slot-count overflow trips it).
    laserscan_beam_slots: int | None = None

    # --- CADRL value-net social norm (CADRLPolicy.py:22-23) ---
    # "none" for the default no_constr net; "right"/"left" activate the
    # passing-side penalty (nn_navigation_value_multi.py:829-894,
    # 2420-2573) that the rotate_constr nets were trained with.
    cadrl_passing_side: str = "none"
    # "no_constr" (47-action free-heading set) or "rotate_constr"
    # (38-slot dynamically-constrained set + clipped heading propagation,
    # nn_navigation_value_multi.py:649-722, 1751-1777)
    cadrl_mode: str = "no_constr"

    # --- RVO / ORCA (envs/config.py:84-86) ---
    rvo_time_horizon: float = 5.0
    rvo_collab_coeff: float = 0.5
    rvo_anti_collab_t: float = 1.0

    # --- termination / mode ---
    done_mode: str = DONE_MODE_EVALUATE

    # --- maps / laserscan sensors ---
    use_static_map: bool = False
    map_x_width: float = 16.0           # envs/collision_avoidance_env.py:389-391
    map_y_width: float = 16.0
    map_grid_cell_size: float = 0.1

    # --- numerics ---
    # "parity" mode = float64 on CPU, replicating the reference's agent state
    # dtype (envs/agent.py:73); "fast" mode = float32 on TPU.
    dtype: str = "float32"
    # The reference buffers every action through a float32 array before
    # integrating dynamics (envs/collision_avoidance_env.py:304-306); we
    # replicate that cast in parity mode.
    cast_actions_to_f32: bool = True
    # Bitwise-parity mode (CPU float64 validation only): routes atan2
    # through host numpy so trajectories match the reference simulator
    # bit-for-bit (XLA's CPU atan2 is 1 ulp off libm on ~8% of inputs —
    # the only divergence source; cos/sin/sqrt agree exactly).  Leave off
    # for TPU runs: pure_callback forces host round-trips.
    strict_parity: bool = False

    # env-wide action limits applied to learning policies
    # (envs/collision_avoidance_env.py:88-91)
    max_speed: float = 1.0
    max_heading_change: float = np.pi / 3

    @property
    def np_dtype(self):
        return np.dtype(self.dtype)

    # -- preset constructors ---------------------------------------------

    @staticmethod
    def evaluate(**overrides) -> "EnvConfig":
        """Mirror of ``EvaluateConfig`` (envs/config.py:193-200)."""
        base = dict(dt=0.1, max_time_ratio=8.0, done_mode=DONE_MODE_EVALUATE)
        base.update(overrides)
        return EnvConfig(**base)

    @staticmethod
    def train(**overrides) -> "EnvConfig":
        """Mirror of the base train-mode ``Config`` (envs/config.py:24-27)."""
        base = dict(dt=0.2, max_time_ratio=2.0, done_mode=DONE_MODE_LEARNING)
        base.update(overrides)
        return EnvConfig(**base)

    def replace(self, **overrides) -> "EnvConfig":
        return dataclasses.replace(self, **overrides)
