"""End-to-end CLI smoke: the actual entry points as subprocesses on a
real on-disk scene (VERDICT r3 next #6; reference flow main.py:110-193).

Drives: scene dir -> main_nerf.py --save_mesh -> main.py (template
pipeline + curved training + checkpoint) -> patch export -> quilting CLI
-> re-import, asserting the on-disk artifacts of every stage.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = [pytest.mark.slow, pytest.mark.nightly]

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd=REPO, timeout=1500):
    env = dict(os.environ)
    env["NERF_TPU_PLATFORM"] = "cpu"      # subprocesses skip the tunnel
    env["PYTHONUNBUFFERED"] = "1"
    # share the suite's machine-scoped persistent compile cache: the CLI
    # stages otherwise cold-compile every program into their throwaway
    # tmp workspaces on every run (~20 min of the suite's wall time)
    from nerf_texture_tpu.utils.misc import machine_scoped_cache_dir
    env.setdefault("JAX_COMPILATION_CACHE_DIR", machine_scoped_cache_dir(
        os.path.join(REPO, ".jax_cache_cpu")))
    r = subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, (args, r.stdout[-3000:], r.stderr[-3000:])
    return r.stdout


def test_cli_pipeline(tmp_path):
    from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset

    scene = str(tmp_path / "scene")
    ws = str(tmp_path / "ws")
    SyntheticSphereDataset(n_frames=6, H=60, W=60).write_to_disk(scene)
    assert os.path.exists(os.path.join(scene, "transforms.json"))

    # stage 1: coarse NGP + mesh extraction (readme steps 1-2)
    out = _run(["main_nerf.py", scene, "--workspace", ws,
                "--iters", "300", "--num_rays", "1024",
                "--eval_interval", "300", "--save_mesh",
                "--mesh_resolution", "64"])
    assert "PSNR=" in out
    mesh_path = os.path.join(ws, "meshes", "ngp_mesh.obj")
    assert os.path.exists(mesh_path), out[-2000:]

    # stage 2: template pipeline + curved training (main.py:110-193)
    out = _run(["main.py", scene, "--workspace", ws, "--iters", "60",
                "--num_rays", "512", "--eval_interval", "60"])
    assert "template:" in out and "PSNR=" in out
    template = os.path.join(ws, "meshes", "surface_coacd_remesh.obj")
    assert os.path.exists(template)
    ckpts = [d for d in os.listdir(os.path.join(ws, "checkpoints"))]
    assert ckpts, "curved checkpoint dir missing"

    # stage 3: patch export through the viewer action surface (the
    # reference GUI 'sample patches' button), quilting CLI, re-import
    code = f"""
import os, sys
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from nerf_texture_tpu.config import get_preset
from nerf_texture_tpu.data.provider import NeRFDataset
from nerf_texture_tpu.geometry.mesh import load_obj
from nerf_texture_tpu.geometry.projector import MeshProjector
from nerf_texture_tpu.models import mesh_field
from nerf_texture_tpu.train.curved_trainer import CurvedTrainer
from nerf_texture_tpu.train.field_io import PatchSampleConfig
from nerf_texture_tpu.viewer.app import ViewerApp

cfg = get_preset({scene!r}, iters=60, num_rays=512)
ds = NeRFDataset(cfg.path, mode="colmap", split="train",
                 downscale=1, scale=cfg.scale)
template = load_obj({template!r})
tr = CurvedTrainer(ds, mesh_field.make_state(MeshProjector(template)),
                   cfg.curved, cfg.render, cfg.curved_train,
                   key=jax.random.PRNGKey(0))
tr.template_mesh = template
ckpt = os.path.join({ws!r}, "checkpoints", cfg.field_name)
tr.load_checkpoint(ckpt)
app = ViewerApp(tr)
field_npz = os.path.join({ws!r}, "field", "smoke.npz")
app.save_field(field_npz, scfg=PatchSampleConfig(
    patch_size=24, max_patch_num=8, center_batch=8))
d = np.load(field_npz, allow_pickle=True)
assert d["patches"].shape[0] >= 4, d["patches"].shape
print("patches:", d["patches"].shape)
"""
    _run(["-c", code])
    field_npz = os.path.join(ws, "field", "smoke.npz")
    assert os.path.exists(field_npz)

    # stage 4: quilting CLI (reference patch_matching_and_quilting.py)
    tex = os.path.join(ws, "field", "texture.npz")
    _run(["patch_matching_and_quilting.py", field_npz,
          "--output_size", "96", "--out", tex])
    t = np.load(tex, allow_pickle=True)
    assert t["features"].ndim == 3 and t["features"].shape[0] >= 96

    # stage 5: re-import the synthesized field + render (GUI 'load
    # synthesis'); textured = non-constant in-silhouette pixels
    code = f"""
import os, sys
sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from nerf_texture_tpu.config import get_preset
from nerf_texture_tpu.data.provider import NeRFDataset
from nerf_texture_tpu.geometry.mesh import load_obj
from nerf_texture_tpu.geometry.projector import MeshProjector
from nerf_texture_tpu.models import mesh_field
from nerf_texture_tpu.train.curved_trainer import CurvedTrainer
from nerf_texture_tpu.viewer.app import ViewerApp

cfg = get_preset({scene!r}, iters=60, num_rays=512)
ds = NeRFDataset(cfg.path, mode="colmap", split="train",
                 downscale=1, scale=cfg.scale)
template = load_obj({template!r})
tr = CurvedTrainer(ds, mesh_field.make_state(MeshProjector(template)),
                   cfg.curved, cfg.render, cfg.curved_train,
                   key=jax.random.PRNGKey(0))
tr.template_mesh = template
tr.load_checkpoint(os.path.join({ws!r}, "checkpoints", cfg.field_name))
app = ViewerApp(tr)
app.load_field({tex!r})
tr.initialize_states(20)
# upsample the render: scale the whole intrinsics (fx fy cx cy) so the
# 160^2 frame is a zoomed version of the 60^2 training view
import jax.numpy as jnp
tr.intrinsics = jnp.asarray(np.asarray(ds.intrinsics) * (160.0 / 60.0))
# reference-exact pool sampling: the imported flat canvas is a thin
# slab; the parity march is the robust path for a smoke assert
out = tr.render_frame(np.asarray(ds.poses[0]), use_ema=False,
                      parity=True, H=160, W=160)
img = np.asarray(out["image"])
assert np.isfinite(img).all()
sil = np.asarray(out["weights_sum"]) > 0.1
assert sil.sum() > 10, sil.sum()
assert img[sil].std() > 0.005, img[sil].std()
print("reimport ok:", img.shape, int(sil.sum()), float(img[sil].std()))
"""
    out = _run(["-c", code])
    assert "reimport ok" in out
