"""A/B the curved inference render path on ONE trained state (round 4).

Round-4 CPU ablations showed a ~10 dB proxy-vs-pool gap on trained
curved states (noprob: proxy 16.4 dB vs pool 26.6 on its own training
view) that does NOT exist for the NGP.  This trains one good state
(noprob so the fit itself is clean) and sweeps every render knob on it:

  pool               : reference-parity march + compacted pool
  pool_noanchor      : pool with exact per-sample projection
  proxy              : default (single-round, pallas, cdf, anchors,
                       two-phase aux shading)
  proxy_topk         : infer_cdf=False (pallas top-k)
  proxy_xla          : proxy_pallas=False, infer_cdf=False
  proxy_nocolor      : no two-phase aux shading (full field on pool)
  proxy_noanchor     : anchor_apply=None (exact per-sample projection)
  proxy_cap16/32     : bigger survivor pool
  proxy_k64          : finer proxy sample grid (proxy_refined=64)

Run: JAX_PLATFORMS=cpu python scripts/_dbg_render_ab.py
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import dataclasses
import json
import time

import numpy as np
import jax

# the container sitecustomize forces the axon platform; the env var is
# read too late, so force the platform through the config (as
# tests/conftest.py).  DBG_PLATFORM=axon runs on the real chip.
_plat = os.environ.get("DBG_PLATFORM", "cpu")
jax.config.update("jax_platforms", _plat)
if _plat == "cpu":
    from nerf_texture_tpu.utils.misc import machine_scoped_cache_dir
    jax.config.update("jax_compilation_cache_dir",
                      machine_scoped_cache_dir("/root/repo/.jax_cache_cpu"))
else:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.geometry.mesh import make_icosphere
from nerf_texture_tpu.geometry.projector import MeshProjector
from nerf_texture_tpu.models import mesh_field
from nerf_texture_tpu.models.curved_field import CurvedFieldConfig
from nerf_texture_tpu.models.mesh_field import MeshFieldConfig
from nerf_texture_tpu.render.renderer import RenderConfig, render_image
from nerf_texture_tpu.train.curved_trainer import (
    CurvedTrainConfig, CurvedTrainer, curved_anchor_apply,
    curved_color_apply, curved_field_apply, curved_sigma_apply,
    _use_frames)
from nerf_texture_tpu.utils.metrics import psnr as psnr_fn

H = W = 48


def emit(**kw):
    print(json.dumps(kw), flush=True)


FCFG = MeshFieldConfig(num_levels=6, level_dim=2, base_resolution=64,
                       desired_resolution=512, log2_bricks=14,
                       prob_model=False)
RCFG = RenderConfig(bound=1.0, cascades=1, grid_size=64, max_steps=256,
                    max_samples_train=96, max_samples_infer=64,
                    ray_chunk=4096, pool_mean_samples=48,
                    pool_mean_samples_infer=16, march_steps_infer=192,
                    proxy_samples=0, proxy_refined=32)
TCFG = CurvedTrainConfig(lr=1e-2, total_steps=1600, num_rays=1024,
                         grid_update_interval=16, grid_full_updates=0)


def render_with(tr, pose, rcfg, *, anchors=True, two_phase=True):
    """CurvedTrainer.render_frame with explicit knobs."""
    params = tr.state.params
    static = (tr.ccfg, tr.mode, tr.visual_mode, tr.light_visual_mode)
    bundle = {"params": params, "field_state": tr.field_state,
              "rt": tr.runtime}
    use_frames = _use_frames(tr.ccfg, tr.mode) and anchors
    if use_frames and tr.anchor_cache:
        bundle["anchor_tab"] = tr._anchor_table()
    anchor = curved_anchor_apply if use_frames else None
    color = (curved_color_apply
             if use_frames and two_phase and tr.visual_mode == "RGB"
             else None)
    return render_image(curved_field_apply, static, bundle,
                        tr.state.occ.occ, pose, tr.intrinsics,
                        tr.H, tr.W, rcfg, bg_color=1.0,
                        anchor_apply=anchor,
                        sigma_apply=curved_sigma_apply,
                        color_apply=color,
                        density=tr.state.occ.density)


def main():
    ccfg = CurvedFieldConfig(field=FCFG, light_model="SH")
    ds = SyntheticSphereDataset(n_frames=4, H=H, W=W)
    mp = MeshProjector(make_icosphere(3, radius=0.5))
    tr = CurvedTrainer(ds, mesh_field.make_state(mp), ccfg, RCFG, TCFG,
                       key=jax.random.PRNGKey(7))
    tr.initialize_states(1)
    t0 = time.perf_counter()
    tr.train(600)
    emit(trained_s=round(time.perf_counter() - t0, 1))

    gt0 = np.asarray(ds.images[0]).astype(np.float32) / 255.0
    gt0 = gt0[..., :3] * gt0[..., 3:] + (1.0 - gt0[..., 3:])
    pose = np.asarray(ds.poses[0])

    arms = {
        "pool": (dataclasses.replace(RCFG, infer_mode="pool"), {}),
        "pool_noanchor": (dataclasses.replace(RCFG, infer_mode="pool"),
                          dict(anchors=False)),
        "proxy": (RCFG, {}),
        "proxy_topk": (dataclasses.replace(RCFG, infer_cdf=False), {}),
        "proxy_xla": (dataclasses.replace(RCFG, infer_cdf=False,
                                          proxy_pallas=False), {}),
        "proxy_nocolor": (RCFG, dict(two_phase=False)),
        "proxy_noanchor": (RCFG, dict(anchors=False)),
        "proxy_cap16": (dataclasses.replace(RCFG, infer_color_cap=16), {}),
        "proxy_cap32": (dataclasses.replace(RCFG, infer_color_cap=32), {}),
        "proxy_k64": (dataclasses.replace(RCFG, proxy_refined=64,
                                          infer_color_cap=16), {}),
    }
    for tag, (rcfg, kw) in arms.items():
        out = render_with(tr, pose, rcfg, **kw)
        img = np.asarray(out["image"])
        ws = np.asarray(out["weights_sum"])
        emit(arm=tag, psnr=round(float(psnr_fn(img, gt0)), 2),
             img_minmax=[round(float(img.min()), 3),
                         round(float(img.max()), 3)],
             wsum_mean=round(float(ws.mean()), 3))
    emit(done=True)


if __name__ == "__main__":
    main()
