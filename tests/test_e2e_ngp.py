"""End-to-end: tiny Instant-NGP fit on the synthetic sphere scene.

All tests share one model/render/train config so the jitted train step,
grid update, and render chunk each compile exactly once per session.
"""

import numpy as np
import jax

from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.data.provider import NeRFDataset
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.trainer import TrainConfig, Trainer

MCFG = NGPConfig(bound=1.0, num_levels=6, level_dim=2, base_resolution=16,
                 log2_hashmap_size=14, desired_resolution=128,
                 hidden_dim=64, hidden_dim_color=64)
# pool mode: this test validates the reference-parity occupancy-march
# renderer mid-training (the proxy fast path needs a converged density
# grid to select samples well; it has its own parity test)
RCFG = RenderConfig(bound=1.0, cascades=1, grid_size=16, max_steps=64,
                    max_samples_train=32, max_samples_infer=48,
                    ray_chunk=1024, infer_mode="pool")
TCFG = TrainConfig(lr=1e-2, total_steps=300, num_rays=256,
                   grid_update_interval=16)


def tiny_trainer(dataset):
    return Trainer(dataset, MCFG, RCFG, TCFG, key=jax.random.PRNGKey(42))


def test_ngp_fits_synthetic_sphere():
    ds = SyntheticSphereDataset(n_frames=12, H=32, W=32)
    tr = tiny_trainer(ds)
    m0 = tr.train(10)
    m1 = tr.train(290)
    assert m1["loss"] < m0["loss"]
    assert m1["mean_samples"] > 1.0  # occupancy grid found the sphere
    val = tr.eval_psnr([0], use_ema=False)
    assert val > 13.0, f"PSNR too low: {val}"
    out = tr.render_frame(ds.poses[0])
    img = np.asarray(out["image"])
    assert np.isfinite(img).all()
    assert img.shape == (32, 32, 3)


def test_dataset_roundtrip(tmp_path):
    ds = SyntheticSphereDataset(n_frames=4, H=32, W=32)
    ds.write_to_disk(str(tmp_path))
    loaded = NeRFDataset(str(tmp_path), mode="colmap", split="all",
                         normalize=False, scale=1.0)
    assert loaded.num_frames == 4
    np.testing.assert_allclose(loaded.poses, ds.poses, atol=1e-5)
    np.testing.assert_array_equal(loaded.images, ds.images)
    np.testing.assert_allclose(loaded.intrinsics, ds.intrinsics, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    ds = SyntheticSphereDataset(n_frames=4, H=32, W=32)
    tr = tiny_trainer(ds)
    tr.train(5)
    tr.save_checkpoint(str(tmp_path / "ckpt"))
    tr2 = tiny_trainer(ds)
    tr2.load_checkpoint(str(tmp_path / "ckpt"))
    assert int(tr2.state.step) == 5
    a = tr.render_frame(ds.poses[0], use_ema=False)["image"]
    b = tr2.render_frame(ds.poses[0], use_ema=False)["image"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
