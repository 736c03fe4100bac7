"""Instant-NGP NeRF model (the coarse-stage network).

TPU-native rebuild of the reference ``NeRFNetwork`` family
(``nerf/network.py:10-206``, and its ffmlp/tcnn twins ``nerf/network_ff.py``,
``nerf/network_tcnn.py`` -- on TPU all three collapse into this one module,
since plain bf16 ``jnp.dot`` MLPs already saturate the MXU; see
``utils/mlp.py``).

Structure (matching nerf/network.py):
  sigma:  hash_encode(x) -> MLP(2 x 64, no bias) -> (sigma=trunc_exp(h0),
          geo_feat=h[1:16])
  color:  [sh_encode(d), geo_feat] -> MLP(3 x 64, no bias) -> sigmoid rgb
  bg:     [hash2d(polar), sh_encode(d)] -> MLP(2 x 64) -> sigmoid rgb
          (only when bg_radius > 0, network.py:71-92)

Everything is a functional pytree: ``init`` returns params, the apply
functions are pure and jit/vmap/grad-safe.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..ops import (HashGridSpec, hash_encode_bound, hash_encode, sh_encode,
                   sh_encode_dim, trunc_exp)
from ..ops.hashgrid_packed import PackedGridSpec, packed_encode_bound
from ..utils.mlp import apply_mlp, init_mlp


@dataclasses.dataclass(frozen=True)
class NGPConfig:
    bound: float = 1.0
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    desired_resolution: int = 2048  # scaled by bound like network.py:31
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    sh_degree: int = 4
    bg_radius: float = -1.0
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    align_corners: bool = True  # tools/encoding.py:48 default
    # "packed" = bricked one-gather-per-level encoder (fast TPU path);
    # "hash" = classic per-corner layout (reference parity, any-order diff)
    encoder: str = "packed"
    log2_bricks: int = 16
    # inference-only: read hash-table rows through a bf16 cast (the
    # gather is HBM-bound; halves row bytes).
    infer_table_bf16: bool = True
    # training: bf16 row gathers with f32 scatter-accumulated gradients
    # (`_rows_lookup_amp`) -- reference fp16-autocast parity
    train_table_bf16: bool = True

    @property
    def grid_spec(self) -> HashGridSpec:
        return HashGridSpec(
            input_dim=3, num_levels=self.num_levels,
            level_dim=self.level_dim,
            base_resolution=self.base_resolution,
            log2_hashmap_size=self.log2_hashmap_size,
            desired_resolution=int(self.desired_resolution * self.bound),
            align_corners=self.align_corners)

    @property
    def packed_spec(self) -> PackedGridSpec:
        return PackedGridSpec(
            input_dim=3, num_levels=self.num_levels,
            level_dim=self.level_dim,
            base_resolution=self.base_resolution,
            log2_bricks=self.log2_bricks,
            desired_resolution=int(self.desired_resolution * self.bound),
            align_corners=self.align_corners)

    @property
    def bg_grid_spec(self) -> HashGridSpec:
        # much smaller 2D hashgrid (network.py:74)
        return HashGridSpec(
            input_dim=2, num_levels=4, level_dim=self.level_dim,
            base_resolution=16, log2_hashmap_size=19,
            desired_resolution=2048, align_corners=self.align_corners)


def init(key, cfg: NGPConfig) -> dict[str, Any]:
    k_grid, k_sigma, k_color, k_bg_grid, k_bg = jax.random.split(key, 5)
    spec = cfg.packed_spec if cfg.encoder == "packed" else cfg.grid_spec
    sigma_dims = ([spec.output_dim]
                  + [cfg.hidden_dim] * (cfg.num_layers - 1)
                  + [1 + cfg.geo_feat_dim])
    color_in = sh_encode_dim(cfg.sh_degree) + cfg.geo_feat_dim
    color_dims = ([color_in] + [cfg.hidden_dim_color]
                  * (cfg.num_layers_color - 1) + [3])
    params = {
        "grid": spec.init(k_grid),
        "sigma_net": init_mlp(k_sigma, sigma_dims),
        "color_net": init_mlp(k_color, color_dims),
    }
    if cfg.bg_radius > 0:
        bg_spec = cfg.bg_grid_spec
        bg_dims = ([bg_spec.output_dim + sh_encode_dim(cfg.sh_degree)]
                   + [cfg.hidden_dim_bg] * (cfg.num_layers_bg - 1) + [3])
        params["bg_grid"] = bg_spec.init(k_bg_grid)
        params["bg_net"] = init_mlp(k_bg, bg_dims)
    return params


def encode_position(params, x, cfg: NGPConfig, fast: bool = True,
                    table_dtype=None):
    """Positional features for x in [-bound, bound] via the configured
    encoder.  fast=False selects the arbitrarily-differentiable path
    (needed under grad-of-grad, e.g. -grad(sigma) normals).

    table_dtype=bf16 reads the hash table through a bf16 cast: the
    gather is HBM-bandwidth-bound at 27*C lanes per row, so halving the
    row bytes cuts the dominant inference cost (~40%); training keeps
    f32 (the cast would detach the custom scatter VJP's accumulation
    precision)."""
    if cfg.encoder == "packed":
        table = params["grid"]
        if table_dtype is not None and table.dtype != table_dtype:
            # rows gather in bf16; fracs stay f32 (a bf16 frac would
            # quantize intra-cell positions to 1/256)
            table = table.astype(table_dtype)
            amp = False
        else:
            # training path: bf16 gather + f32 gradient accumulation
            amp = cfg.train_table_bf16
        return packed_encode_bound(x, table, cfg.packed_spec,
                                   bound=cfg.bound, fast=fast, amp=amp)
    return hash_encode_bound(x, params["grid"], cfg.grid_spec,
                             bound=cfg.bound)


def density(params, x, cfg: NGPConfig, fast: bool = True,
            table_dtype=None):
    """x: [..., 3] in [-bound, bound] -> (sigma [...], geo_feat [..., G])."""
    feat = encode_position(params, x, cfg, fast=fast,
                           table_dtype=table_dtype)
    h = apply_mlp(params["sigma_net"], feat)
    sigma = trunc_exp(h[..., 0])
    return sigma, h[..., 1:]


def color(params, d, geo_feat, cfg: NGPConfig):
    """d: [..., 3] unit dirs; geo_feat: [..., G] -> rgb [..., 3]."""
    d_enc = sh_encode(d, cfg.sh_degree)
    h = jnp.concatenate([d_enc, geo_feat], axis=-1)
    return apply_mlp(params["color_net"], h,
                     final_activation=jax.nn.sigmoid)


def forward(params, x, d, cfg: NGPConfig, table_dtype=None):
    sigma, geo_feat = density(params, x, cfg, table_dtype=table_dtype)
    rgb = color(params, d, geo_feat, cfg)
    return sigma, rgb


def background(params, polar, d, cfg: NGPConfig):
    """polar: [..., 2] in [-1, 1] sphere coords; d: [..., 3] unit dirs."""
    feat = hash_encode((polar + 1.0) * 0.5, params["bg_grid"],
                       cfg.bg_grid_spec)
    d_enc = sh_encode(d, cfg.sh_degree)
    h = jnp.concatenate([d_enc, feat], axis=-1)
    return apply_mlp(params["bg_net"], h, final_activation=jax.nn.sigmoid)
