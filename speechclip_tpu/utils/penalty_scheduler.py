"""Piecewise-linear loss-weight schedule by global step.

Capability equivalent of the reference's PenaltyScheduler
(avssl/util/penalty_scheduler.py:4-28 — latent in the active path): a weight
that linearly interpolates between keypoints as training progresses; usable
as an auxiliary loss weight (e.g., diversity loss annealing).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


class PenaltyScheduler:
    def __init__(self, weights: Sequence[float], keypoints: Sequence[int]):
        assert len(weights) == len(keypoints), (weights, keypoints)
        assert list(keypoints) == sorted(keypoints)
        self.weights = [float(w) for w in weights]
        self.keypoints = [int(k) for k in keypoints]
        self.value = self.weights[0]

    def update(self, global_step: int) -> float:
        self.value = self.get_value(global_step)
        return self.value

    def get_value(self, global_step: int) -> float:
        ks, ws = self.keypoints, self.weights
        if global_step <= ks[0]:
            return ws[0]
        if global_step >= ks[-1]:
            return ws[-1]
        for (k0, w0), (k1, w1) in zip(
            zip(ks[:-1], ws[:-1]), zip(ks[1:], ws[1:])
        ):
            if k0 <= global_step <= k1:
                frac = (global_step - k0) / max(k1 - k0, 1)
                return w0 + (w1 - w0) * frac
        return ws[-1]

    def get_value_traced(self, global_step):
        """jit-friendly variant over a traced step."""
        step = jnp.asarray(global_step, jnp.float32)
        value = jnp.asarray(self.weights[0], jnp.float32)
        for (k0, w0), (k1, w1) in zip(
            zip(self.keypoints[:-1], self.weights[:-1]),
            zip(self.keypoints[1:], self.weights[1:]),
        ):
            frac = jnp.clip((step - k0) / max(k1 - k0, 1), 0.0, 1.0)
            seg = w0 + (w1 - w0) * frac
            value = jnp.where(step >= k0, seg, value)
        return value
