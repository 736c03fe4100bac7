"""Teacher auto-load for distillation (reference nerf/utils.py:535-567).

The reference's Trainer builds a frozen coarse-NGP teacher and loads its
checkpoint from the workspace whenever distillation is on, continuing
with a warning when it is missing (:582-591).  ``load_ngp_teacher``
mirrors that: restore ``<workspace>/checkpoints/ngp`` -> (params, cfg),
or None + warning.
"""

import warnings

import jax
import numpy as np
import pytest

from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.geometry.mesh import make_icosphere
from nerf_texture_tpu.geometry.projector import MeshProjector
from nerf_texture_tpu.models import mesh_field
from nerf_texture_tpu.models.curved_field import CurvedFieldConfig
from nerf_texture_tpu.models.mesh_field import MeshFieldConfig
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train.curved_trainer import (CurvedTrainConfig,
                                                   CurvedTrainer,
                                                   load_ngp_teacher)
from nerf_texture_tpu.train.trainer import TrainConfig, Trainer

MCFG = NGPConfig(bound=1.0, num_levels=4, level_dim=2, base_resolution=16,
                 log2_hashmap_size=12, desired_resolution=64,
                 hidden_dim=32, hidden_dim_color=32)
RCFG = RenderConfig(bound=1.0, cascades=1, grid_size=16, max_steps=48,
                    max_samples_train=24, max_samples_infer=32,
                    ray_chunk=1024, pool_mean_samples=16,
                    pool_mean_samples_infer=16, infer_mode="pool")
FCFG = MeshFieldConfig(num_levels=3, level_dim=2, base_resolution=16,
                       desired_resolution=32, log2_bricks=9,
                       h_threshold=0.12, clustering=False)
CCFG = CurvedFieldConfig(field=FCFG, light_model="SH", hidden_dim=16,
                         geo_feat_dim=7)


def test_missing_checkpoint_warns_and_returns_none(tmp_path):
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = load_ngp_teacher(str(tmp_path))
    assert out is None
    assert any("distillation disabled" in str(x.message) for x in w)


@pytest.mark.slow
def test_teacher_autoload_and_distilled_training(tmp_path):
    ds = SyntheticSphereDataset(n_frames=3, H=24, W=24)
    ngp_tr = Trainer(ds, MCFG, RCFG,
                     TrainConfig(lr=1e-2, total_steps=50, num_rays=128,
                                 grid_update_interval=16),
                     key=jax.random.PRNGKey(1))
    ngp_tr.train(4)
    ckpt = tmp_path / "checkpoints" / "ngp"
    ngp_tr.save_checkpoint(str(ckpt))

    teacher = load_ngp_teacher(str(tmp_path), MCFG)
    assert teacher is not None
    t_params, t_cfg = teacher
    assert t_cfg is MCFG
    np.testing.assert_allclose(
        np.asarray(t_params["sigma_net"][0]["w"]),
        np.asarray(ngp_tr.state.params["sigma_net"][0]["w"]))

    # distilled curved training: prob 1.0 so every step takes the
    # distill branch (sigma-remap + color MSE vs the frozen teacher)
    mp = MeshProjector(make_icosphere(2, radius=0.5))
    tcfg = CurvedTrainConfig(lr=5e-3, total_steps=100, num_rays=64,
                             grid_update_interval=8, grid_full_updates=1,
                             distillation=True, distillation_prob=1.0)
    tr = CurvedTrainer(ds, mesh_field.make_state(mp), CCFG, RCFG, tcfg,
                       teacher=teacher, key=jax.random.PRNGKey(0))
    m = tr.train(3)
    assert np.isfinite(m["loss"])
    assert int(tr.state.step) == 3


@pytest.mark.slow
def test_distillation_without_teacher_falls_back(tmp_path):
    """tcfg.distillation=True but teacher=None must train normally."""
    ds = SyntheticSphereDataset(n_frames=2, H=16, W=16)
    mp = MeshProjector(make_icosphere(1, radius=0.5))
    tcfg = CurvedTrainConfig(lr=5e-3, total_steps=100, num_rays=32,
                             grid_update_interval=8, grid_full_updates=1,
                             distillation=True, distillation_prob=1.0)
    tr = CurvedTrainer(ds, mesh_field.make_state(mp), CCFG, RCFG, tcfg,
                       teacher=None, key=jax.random.PRNGKey(0))
    m = tr.train(2)
    assert np.isfinite(m["loss"])
