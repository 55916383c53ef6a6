"""Observation flattening, replacing ``envs/wrappers.py``.

The reference wraps its env in gym ObservationWrappers that flatten the
per-agent dict obs into arrays with index bookkeeping
(``MultiagentFlattenDictWrapper`` / ``MultiagentDictToMultiagentArrayWrapper``,
envs/wrappers.py:11-173).  Our obs is already a dict of ``[A, ...]``
arrays, so flattening is pure reshape/concat; :class:`ObsLayout` carries
the same index bookkeeping (key -> slice) for inverse transforms.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ObsLayout:
    """Index bookkeeping: key -> (low, high) within one agent's flat obs."""

    keys: Tuple[str, ...]
    slices: Dict[str, Tuple[int, int]]
    shapes: Dict[str, Tuple[int, ...]]
    agent_size: int

    @staticmethod
    def from_obs(obs: Dict[str, jnp.ndarray], keys: Sequence[str]) -> "ObsLayout":
        slices, shapes = {}, {}
        size = 0
        for key in keys:
            shape = tuple(obs[key].shape[1:])  # drop agent axis
            n = int(np.prod(shape)) if shape else 1
            slices[key] = (size, size + n)
            shapes[key] = shape
            size += n
        return ObsLayout(tuple(keys), slices, shapes, size)

    def to_array(self, obs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Dict obs -> [A, agent_size] (the
        MultiagentDictToMultiagentArrayWrapper layout, wrappers.py:164-173)."""
        A = next(iter(obs.values())).shape[0]
        parts = [obs[k].reshape(A, -1) for k in self.keys]
        return jnp.concatenate(parts, axis=-1)

    def to_flat(self, obs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Dict obs -> [A * agent_size] single vector (the
        MultiagentFlattenDictWrapper layout, wrappers.py:55-63)."""
        return self.to_array(obs).reshape(-1)

    def to_dict(self, array) -> Dict[str, jnp.ndarray]:
        """Inverse of :meth:`to_array` (wrappers.py:65-77)."""
        out = {}
        for key in self.keys:
            lo, hi = self.slices[key]
            out[key] = array[..., lo:hi].reshape(
                array.shape[:-1] + self.shapes[key]
            )
        return out

    def agent_slice(self, agent: int) -> Tuple[int, int]:
        """Bounds of one agent inside the flat vector (wrappers.py:125-133)."""
        return agent * self.agent_size, (agent + 1) * self.agent_size
