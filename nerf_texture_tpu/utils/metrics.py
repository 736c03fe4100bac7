"""Evaluation metrics (PSNRMeter parity, nerf/utils.py:315-349)."""

from __future__ import annotations

import numpy as np


def psnr(pred, gt) -> float:
    """Peak signal-to-noise ratio over [0, 1] images.

    Computed host-side: the pred image crosses to the host anyway, and
    doing the reduction in numpy avoids compiling 4 one-off device
    programs (subtract/pow/mean/divide) -- each tiny compile and dispatch
    costs seconds-to-ms through the remote TPU tunnel."""
    a = np.asarray(pred, np.float32)
    b = np.asarray(gt, np.float32)
    mse = float(np.mean((a - b) ** 2))
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
