"""Evaluation metrics (PSNRMeter parity, nerf/utils.py:315-349)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def psnr(pred, gt) -> float:
    """Peak signal-to-noise ratio over [0, 1] images."""
    mse = float(jnp.mean((jnp.asarray(pred) - jnp.asarray(gt)) ** 2))
    if mse <= 1e-12:
        return 99.0
    return -10.0 * float(np.log10(mse))


class PSNRMeter:
    def __init__(self):
        self.v = 0.0
        self.n = 0

    def update(self, pred, gt):
        self.v += psnr(pred, gt)
        self.n += 1

    @property
    def average(self) -> float:
        return self.v / max(self.n, 1)

    def clear(self):
        self.v, self.n = 0.0, 0
