"""A drop-in ``rvo2`` module backed by the from-scratch C++ ORCA oracle.

The reference's Python-RVO2 submodule is not checked out in this image,
so the reference env could never run its own ``RVOPolicy``
(envs/policies/RVOPolicy.py imports ``rvo2`` at module import).  This
shim implements exactly the ``PyRVOSimulator`` surface that wrapper uses
(:25-28, 46, 70-74, 86-96) on top of ``native/orca.cpp`` — the same
independent C++ oracle the JAX ORCA kernel is validated against
(tests/test_orca.py, 1e-9) — which lets the reference's own wrapper
code (private-world mirroring, x1.05 radius, collabCoeff, pi/6
stop-and-turn) run as a true env-level oracle for RVO scenarios.

``doStep`` follows RVO2 semantics: compute every agent's new ORCA
velocity from the current snapshot, then integrate positions by one
``timeStep``.  Only the ego agent's position is ever read back by the
reference wrapper, and an agent's ORCA velocity depends only on its OWN
collaboration coefficient, so the never-set default coefficient of the
mirrored agents is behaviorally irrelevant (the same collapse argument
that lets policies/rvo.py batch the N private worlds into one kernel).

Install with :func:`install` BEFORE importing the reference package.
"""

from __future__ import annotations

import sys

import numpy as np


class PyRVOSimulator:
    def __init__(self, timeStep, neighborDist, maxNeighbors, timeHorizon,
                 timeHorizonObst, radius, maxSpeed):
        from gym_collision_avoidance_tpu.utils import native_build

        self._orca = native_build.load_orca()
        self.time_step = float(timeStep)
        self.neighbor_dist = float(neighborDist)
        self.max_neighbors = int(maxNeighbors)
        self.time_horizon = float(timeHorizon)
        self.default_radius = float(radius)
        self.default_max_speed = float(maxSpeed)
        self.pos = []
        self.vel = []
        self.pref_vel = []
        self.radius = []
        self.max_speed = []
        # fork default: fully reciprocal (irrelevant for mirrored agents,
        # see module docstring)
        self.collab = []

    def addAgent(self, pos):
        self.pos.append(np.asarray(pos, np.float64))
        self.vel.append(np.zeros(2))
        self.pref_vel.append(np.zeros(2))
        self.radius.append(self.default_radius)
        self.max_speed.append(self.default_max_speed)
        self.collab.append(0.5)
        return len(self.pos) - 1

    def setAgentMaxSpeed(self, i, v):
        self.max_speed[i] = float(v)

    def setAgentRadius(self, i, r):
        self.radius[i] = float(r)

    def setAgentPosition(self, i, p):
        self.pos[i] = np.asarray(p, np.float64)

    def setAgentVelocity(self, i, v):
        self.vel[i] = np.asarray(v, np.float64)

    def setAgentPrefVelocity(self, i, v):
        self.pref_vel[i] = np.asarray(v, np.float64)

    def setAgentCollabCoeff(self, i, c):
        self.collab[i] = float(c)

    def doStep(self):
        new_vel = self._orca(
            np.stack(self.pos), np.stack(self.vel), np.stack(self.pref_vel),
            np.asarray(self.radius), np.asarray(self.max_speed),
            np.asarray(self.collab), self.time_step, self.neighbor_dist,
            self.max_neighbors, self.time_horizon,
        )
        for i in range(len(self.pos)):
            self.vel[i] = new_vel[i]
            self.pos[i] = self.pos[i] + self.time_step * new_vel[i]

    def getAgentPosition(self, i):
        return tuple(self.pos[i])


def install():
    """Register this module as ``rvo2`` (idempotent; must run before the
    reference package first imports).

    If a real Python-RVO2 is installed (importable but not yet imported),
    leave it alone — the reference-env oracle should stay independent of
    the C++ oracle whenever the genuine library exists.
    """
    import importlib.util

    if "rvo2" in sys.modules:
        return
    if importlib.util.find_spec("rvo2") is not None:
        print("rvo2_shim: real Python-RVO2 found; shim NOT installed")
        return
    sys.modules["rvo2"] = sys.modules[__name__]
