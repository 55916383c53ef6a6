"""Smoke test for the end-to-end RL training example: the LearningPolicy
plumbing (external continuous actions, obs flattening, on-device rollout
+ REINFORCE update) must produce finite, improving returns."""

import numpy as np
import jax


def test_train_example_single_agent_improves():
    from scripts.train_example import build

    run = build(64, 30, seed=0, num_agents=1)
    p, rets = run(14)
    rets = np.asarray(rets)
    assert np.isfinite(rets).all()
    # single-agent goal reaching with dense shaping: returns must trend up
    assert rets[-5:].mean() > rets[:5].mean() + 0.02, rets


def test_train_example_two_agent_step_runs():
    from scripts.train_example import build

    run = build(16, 8, seed=1, num_agents=2)
    p, rets = run(2)
    assert np.isfinite(np.asarray(rets)).all()
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree.leaves(p))
