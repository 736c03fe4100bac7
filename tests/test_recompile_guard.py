"""Novel-view renders must compile ZERO new programs after the first.

Every distinct compiled program is a remote-compiler round trip through
the TPU tunnel (seconds-class on a cold start) and usually a per-frame
host dispatch too.  Round 1 shipped a 934 s warmup largely from
shape-/pose-dependent recompiles; this guards the invariant that the
whole frame path (ray gen -> prepass+compaction -> fused chunks ->
frame out) reuses one executable set for every pose.

Companion audit scripts: scripts/_count_compiles{,_curved}.py.
"""

import logging

import numpy as np
import jax
import jax.numpy as jnp

from nerf_texture_tpu.data.poses import orbit_pose
from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.trainer import TrainConfig, Trainer


class _CompileCounter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.names = []

    def emit(self, rec):
        msg = rec.getMessage()
        if msg.startswith("Compiling "):
            self.names.append(msg.split()[1])


def test_novel_views_compile_nothing_new():
    ds = SyntheticSphereDataset(n_frames=2, H=48, W=48)
    mcfg = NGPConfig(bound=1.0, num_levels=4, level_dim=2, log2_bricks=10,
                     desired_resolution=128)
    rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=32, max_steps=64,
                        max_samples_train=32, max_samples_infer=24,
                        ray_chunk=1024, pool_mean_samples=8,
                        pool_mean_samples_infer=8, proxy_samples=0,
                        proxy_refined=8, infer_color_cap=4)
    tcfg = TrainConfig(lr=1e-2, total_steps=100, num_rays=256)
    tr = Trainer(ds, mcfg, rcfg, tcfg, key=jax.random.PRNGKey(3))
    tr.train(18)   # past one grid refresh so density/occ are realistic

    # first novel view compiles the frame programs
    out = tr.render_frame(orbit_pose(np.pi / 2 + 0.3, 0.2, ds.radius),
                          use_ema=False)
    jax.block_until_ready(out["image"])

    counter = _CompileCounter()
    loggers = [logging.getLogger("jax._src.interpreters.pxla"),
               logging.getLogger("jax._src.dispatch")]
    old_levels = [lg.level for lg in loggers]
    try:
        jax.config.update("jax_log_compiles", True)
        for lg in loggers:
            lg.setLevel(logging.DEBUG)
            lg.addHandler(counter)
        # more novel poses, a repeated train run, and an eval: all reuse
        # the executables compiled above
        for i in range(3):
            out = tr.render_frame(
                orbit_pose(np.pi / 2 - 0.4 * i, 0.1 * i, ds.radius),
                use_ema=False)
            jax.block_until_ready(out["image"])
        tr.train(18)
        tr.eval_psnr([0], use_ema=False)
    finally:
        jax.config.update("jax_log_compiles", False)
        for lg, lv in zip(loggers, old_levels):
            lg.removeHandler(counter)
            lg.setLevel(lv)

    assert counter.names == [], (
        f"novel views/eval recompiled: {counter.names}")
