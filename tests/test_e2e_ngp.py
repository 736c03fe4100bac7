"""End-to-end: tiny Instant-NGP fit on the synthetic sphere scene.

All tests share one model/render/train config so the jitted train step,
grid update, and render chunk each compile exactly once per session.
"""

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow

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


def test_background_sphere_composites():
    """bg_radius > 0: the learned background sphere trains through the
    (1 - w_sum) * bg composite term and miss rays render it (reference
    nerf/network.py:145-160, nerf/renderer.py:247-256)."""
    import dataclasses
    import jax.numpy as jnp
    from nerf_texture_tpu.train.trainer import ngp_background_image

    ds = SyntheticSphereDataset(n_frames=4, H=24, W=24)
    mcfg = dataclasses.replace(MCFG, bg_radius=4.0)
    tr = Trainer(ds, mcfg, RCFG,
                 dataclasses.replace(TCFG, total_steps=40),
                 key=jax.random.PRNGKey(0))
    bg0 = np.asarray(tr.state.params["bg_net"][0]["w"]).copy()
    tr.train(40)
    bg1 = np.asarray(tr.state.params["bg_net"][0]["w"])
    # gradient flowed into the bg net via the composite term
    assert np.abs(bg1 - bg0).max() > 0, "bg net received no gradient"

    # exact composite relation: image = image(bg=0) + (1 - acc) * bg
    from nerf_texture_tpu.render.renderer import render_image
    from nerf_texture_tpu.train.trainer import (
        ngp_color_apply, ngp_field_apply, ngp_sigma_apply)

    out = tr.render_frame(ds.poses[0], use_ema=False)
    img = np.asarray(out["image"]).reshape(-1, 3)
    acc = np.asarray(out["weights_sum"]).reshape(-1)
    out0 = render_image(ngp_field_apply, mcfg, tr.state.params,
                        tr.state.occ.occ, ds.poses[0], tr.intrinsics,
                        24, 24, RCFG, bg_color=0.0,
                        sigma_apply=ngp_sigma_apply,
                        color_apply=ngp_color_apply)
    fg = np.asarray(out0["image"]).reshape(-1, 3)
    bg_img = np.asarray(ngp_background_image(
        tr.state.params, jnp.asarray(ds.poses[0]), tr.intrinsics,
        H=24, W=24, mcfg=mcfg))
    expect = fg + (1.0 - acc)[:, None] * bg_img
    np.testing.assert_allclose(img, expect, atol=2e-2)
    # and the learned bg is what low-acc rays actually show
    low = acc < np.quantile(acc, 0.2)
    assert low.any()
    np.testing.assert_allclose(
        img[low], fg[low] + (1.0 - acc[low])[:, None] * bg_img[low],
        atol=2e-2)


def test_best_checkpoint_ema_swap(tmp_path):
    """checkpoint_best saves only on metric improvement and stores
    EMA-swapped weights (nerf/utils.py:1523-1539)."""
    ds = SyntheticSphereDataset(n_frames=4, H=32, W=32)
    tr = tiny_trainer(ds)
    tr.train(8)
    assert tr.checkpoint_best(20.0, str(tmp_path))       # first: saves
    ema_at_best = jax.tree_util.tree_map(
        np.asarray, tr.state.ema_params)
    tr.train(8)
    assert not tr.checkpoint_best(19.0, str(tmp_path))   # worse: skipped
    tr2 = tiny_trainer(ds)
    assert tr2.load_best(str(tmp_path))
    # both params and ema_params restore to the EMA at save time
    for got, want in zip(
            jax.tree_util.tree_leaves(tr2.state.params),
            jax.tree_util.tree_leaves(ema_at_best)):
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
    assert int(tr2.state.step) == 8
    # improvement after the skip overwrites best
    assert tr.checkpoint_best(21.0, str(tmp_path))


def test_tolerant_load_logs_keys(tmp_path, capsys):
    """Non-strict restore keeps unmatched keys at current values and
    reports missing/unexpected (nerf/utils.py:1560-1565)."""
    import dataclasses

    ds = SyntheticSphereDataset(n_frames=4, H=24, W=24)
    src = tiny_trainer(ds)           # no bg net
    src.train(3)
    src.save_checkpoint(str(tmp_path / "ck"))

    mcfg_bg = dataclasses.replace(MCFG, bg_radius=4.0)
    dst = Trainer(ds, mcfg_bg, RCFG, TCFG, key=jax.random.PRNGKey(1))
    bg_before = np.asarray(dst.state.params["bg_net"][0]["w"]).copy()
    from nerf_texture_tpu.train.trainer import tolerant_load
    missing, unexpected = tolerant_load(dst, str(tmp_path / "ck"))
    assert any("bg_net" in m for m in missing)
    # shared keys restored, missing key kept at its init value
    np.testing.assert_allclose(
        np.asarray(dst.state.params["grid"]),
        np.asarray(src.state.params["grid"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(dst.state.params["bg_net"][0]["w"]), bg_before)
    assert int(dst.state.step) == 3

    # reverse direction: checkpoint has keys the model lacks
    dst.save_checkpoint(str(tmp_path / "ck2"))
    missing2, unexpected2 = tolerant_load(src, str(tmp_path / "ck2"))
    assert any("bg_net" in u for u in unexpected2)


def test_crop_aabb_culls_render():
    """Inference AABB crop (reference gui.py:677-692): an empty crop
    renders pure background; a half-space crop removes content."""
    ds = SyntheticSphereDataset(n_frames=4, H=24, W=24)
    tr = tiny_trainer(ds)
    tr.train(60)
    full = tr.render_frame(ds.poses[0], use_ema=False)
    ws_full = float(np.asarray(full["weights_sum"]).sum())
    assert ws_full > 0
    tr.crop_aabb = np.array([2.0, 2.0, 2.0, 3.0, 3.0, 3.0], np.float32)
    empty = tr.render_frame(ds.poses[0], use_ema=False)
    assert float(np.asarray(empty["weights_sum"]).sum()) == 0.0
    tr.crop_aabb = np.array([-1.0, -1.0, 0.0, 1.0, 1.0, 1.0], np.float32)
    half = tr.render_frame(ds.poses[0], use_ema=False)
    ws_half = float(np.asarray(half["weights_sum"]).sum())
    assert 0.0 < ws_half < ws_full
    tr.crop_aabb = None


def test_resume_modes(tmp_path):
    """scratch / latest / latest_model / best / path resume modes
    (reference nerf/utils.py:499-517; VERDICT r4 next #6)."""
    ds = SyntheticSphereDataset(n_frames=4, H=32, W=32)
    tr = tiny_trainer(ds)
    tr.train(5)
    tr.checkpoint(str(tmp_path))                 # rotating ckpt at step 5
    tr.train(3)
    tr.checkpoint(str(tmp_path))                 # rotating ckpt at step 8
    tr.checkpoint_best(25.0, str(tmp_path))      # best (EMA-swapped)
    # rotation: max_keep=2 keeps exactly the two newest
    import os
    kept = sorted(d for d in os.listdir(tmp_path / "checkpoints")
                  if d.startswith("ckpt_"))
    assert kept == ["ckpt_00000005", "ckpt_00000008"]

    # scratch: no load
    t2 = tiny_trainer(ds)
    msg = t2.resume("scratch", str(tmp_path))
    assert int(t2.state.step) == 0 and "scratch" in msg

    # latest: full state at step 8
    t3 = tiny_trainer(ds)
    t3.resume("latest", str(tmp_path))
    assert int(t3.state.step) == 8

    # latest_model: weights only -- step/optimizer stay fresh, params match
    t4 = tiny_trainer(ds)
    t4.resume("latest_model", str(tmp_path))
    assert int(t4.state.step) == 0
    for a, b in zip(jax.tree.leaves(t4.state.params),
                    jax.tree.leaves(tr.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # best: params are the EMA-swapped weights recorded at save time
    t5 = tiny_trainer(ds)
    t5.resume("best", str(tmp_path))
    for a, b in zip(jax.tree.leaves(t5.state.params),
                    jax.tree.leaves(tr.state.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # explicit path
    t6 = tiny_trainer(ds)
    t6.resume(str(tmp_path / "checkpoints" / "ckpt_00000005"))
    assert int(t6.state.step) == 5

    # best falls back to latest when no best exists
    import shutil
    shutil.rmtree(tmp_path / "checkpoints" / "best")
    os.remove(tmp_path / "checkpoints" / "best.json")
    t7 = tiny_trainer(ds)
    msg = t7.resume("best", str(tmp_path))
    assert int(t7.state.step) == 8 and "fell back" in msg
