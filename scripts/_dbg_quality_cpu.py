"""CPU-scale ablation of the curved flagship's quality bug (VERDICT r3 #1).

BENCH_r03: curved trains to ~15 dB on its OWN training views (gray mush)
while the NGP hits 27 on the same scene.  This isolates which piece kills
the fit at a small scale where CPU iteration is fast:

  base        : SH light, prob noise, per-ray projection, anchors
  noprob      : prob_model=False (no feature noise)
  nolight     : light_model='None' (static SH-reflection color net)
  exactproj   : per_ray_projection=False (exact per-sample projection)

plus a grad-norm breakdown at an early step for the base config.
Run: JAX_PLATFORMS=cpu python scripts/_dbg_quality_cpu.py [variants...]
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
# read too late, so force CPU through the config (as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
from nerf_texture_tpu.utils.misc import machine_scoped_cache_dir
jax.config.update("jax_compilation_cache_dir",
                  machine_scoped_cache_dir("/root/repo/.jax_cache_cpu"))
import jax.numpy as jnp

from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.geometry.mesh import make_icosphere
from nerf_texture_tpu.geometry.projector import MeshProjector
from nerf_texture_tpu.models import mesh_field
from nerf_texture_tpu.models.curved_field import CurvedFieldConfig
from nerf_texture_tpu.models.mesh_field import MeshFieldConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.curved_trainer import (CurvedTrainConfig,
                                                   CurvedTrainer)
from nerf_texture_tpu.utils.metrics import psnr as psnr_fn

H = W = 48
STEPS = [200, 600, 1200]


def emit(**kw):
    print(json.dumps(kw), flush=True)


FCFG = MeshFieldConfig(num_levels=6, level_dim=2, base_resolution=64,
                       desired_resolution=512, log2_bricks=14)
RCFG = RenderConfig(bound=1.0, cascades=1, grid_size=64, max_steps=256,
                    max_samples_train=96, max_samples_infer=64,
                    ray_chunk=4096, pool_mean_samples=48,
                    pool_mean_samples_infer=16, march_steps_infer=192,
                    proxy_samples=0, proxy_refined=32)
TCFG = CurvedTrainConfig(lr=1e-2, total_steps=1600, num_rays=1024,
                         grid_update_interval=16, grid_full_updates=0)

VARIANTS = {
    "base": {},   # logvar_init=-8 default (the round-4 prob-noise fix)
    "probref": dict(field=dict(logvar_init=0.0)),  # reference-style init
    "noprob": dict(field=dict(prob_model=False)),
    "nolight": dict(light_model="None"),
    "exactproj": dict(field=dict(per_ray_projection=False)),
    "noprob_nolight": dict(field=dict(prob_model=False),
                           light_model="None"),
    # the BENCH field config (reference tools/map.py:563: all levels
    # fine, 512 -> 1024): reproduces the 800^2 15 dB fur at CPU scale?
    "basefine": dict(field=dict(base_resolution=512,
                                desired_resolution=1024, num_levels=8,
                                log2_bricks=16)),
    "basefine_exactproj": dict(field=dict(
        base_resolution=512, desired_resolution=1024, num_levels=8,
        log2_bricks=16, per_ray_projection=False)),
}


def make_ccfg(spec):
    fkw = spec.get("field", {})
    fcfg = dataclasses.replace(FCFG, **fkw)
    ckw = {k: v for k, v in spec.items() if k != "field"}
    return CurvedFieldConfig(field=fcfg, light_model=ckw.pop(
        "light_model", "SH"), **ckw)


def grad_norms(tr):
    """One loss/grad eval on the current state; returns tree-group norms."""
    from nerf_texture_tpu.train.curved_trainer import _curved_train_step_body
    # reuse the step body's loss via jax.grad by monkey-level re-run:
    # cheapest is to run one step and diff params before/after per group
    import copy
    p0 = jax.tree.map(lambda a: np.asarray(a).copy(), tr.state.params)
    tr.train(1)
    p1 = tr.state.params
    out = {}
    for k in p0:
        d = jax.tree.map(lambda a, b: float(np.abs(np.asarray(b) - a).max()),
                         p0[k], p1[k])
        flat = jax.tree.leaves(d)
        out[k] = round(max(flat) if flat else 0.0, 6)
    return out


def run(tag):
    ccfg = make_ccfg(VARIANTS[tag])
    ds = SyntheticSphereDataset(n_frames=4, H=H, W=W)
    mp = MeshProjector(make_icosphere(3, radius=0.5))
    tr = CurvedTrainer(ds, mesh_field.make_state(mp), ccfg, RCFG, TCFG,
                       key=jax.random.PRNGKey(7))
    tr.initialize_states(1)
    emit(tag=tag, update_delta=grad_norms(tr))
    gt0 = np.asarray(ds.images[0]).astype(np.float32) / 255.0
    gt0 = gt0[..., :3] * gt0[..., 3:] + (1.0 - gt0[..., 3:])
    done = 1
    for target in STEPS:
        t0 = time.perf_counter()
        tr.train(target - done)
        done = target
        out_p = tr.render_frame(np.asarray(ds.poses[0]), use_ema=False)
        img_p = np.asarray(out_p["image"])
        p_proxy = float(psnr_fn(img_p, gt0))
        old = tr.rcfg
        tr.rcfg = dataclasses.replace(old, infer_mode="pool")
        out_pool = tr.render_frame(np.asarray(ds.poses[0]), use_ema=False)
        img_l = np.asarray(out_pool["image"])
        p_pool = float(psnr_fn(img_l, gt0))
        tr.rcfg = old
        emit(tag=tag, steps=target, train_view_proxy=round(p_proxy, 2),
             train_view_pool=round(p_pool, 2),
             img_proxy_minmax=[round(float(img_p.min()), 3),
                               round(float(img_p.max()), 3)],
             img_pool_minmax=[round(float(img_l.min()), 3),
                              round(float(img_l.max()), 3)],
             train_s=round(time.perf_counter() - t0, 1))
    return tr


if __name__ == "__main__":
    tags = sys.argv[1:] or list(VARIANTS)
    for tag in tags:
        run(tag)
    emit(done=True)
