"""Explicit light-probe environment model (Blinn-Phong style).

Rebuild of the reference ``Envmap_EnvmapMaterialNet``
(nerf/envmap_light_model.py:91-176): a learnable env_res x env_res grid of
light probes with per-pixel solid angles, a BRDF MLP head
(albedo/specular/glossiness), diffuse n.l and specular (n.h)^gloss terms
with coarse-normal hemisphere visibility, and 1/gamma tone mapping.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.mlp import apply_mlp, init_mlp
from .sh import safe_pow


@dataclasses.dataclass(frozen=True)
class EnvmapLightConfig:
    input_dim: int = 15
    env_res: int = 16
    white_light: bool = True
    use_specular: bool = True
    min_glossiness: float = 1.0
    gamma: float = 2.4
    hidden: int = 64
    num_layers: int = 3


def gen_light_dirs(h: int, w: int):
    """Probe directions + solid angles on the latlong sphere
    (gen_light_xyz, envmap_light_model.py:53-88)."""
    lat_step = math.pi / (h + 2)
    lng_step = 2 * math.pi / (w + 2)
    lats = np.linspace(math.pi / 2 - lat_step, -math.pi / 2 + lat_step, h)
    lngs = np.linspace(math.pi - lng_step, -math.pi + lng_step, w)
    lngs_g, lats_g = np.meshgrid(lngs, lats)
    x = np.cos(lats_g) * np.cos(lngs_g)
    y = np.cos(lats_g) * np.sin(lngs_g)
    z = np.sin(lats_g)
    dirs = np.stack([x, y, z], -1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    sin_colat = np.sin(math.pi / 2 - lats_g)
    areas = 4 * math.pi * sin_colat / np.sum(sin_colat)
    return dirs.astype(np.float32), areas.astype(np.float32)


def init(key, cfg: EnvmapLightConfig) -> dict[str, Any]:
    k1, k2 = jax.random.split(key)
    cdim = 1 if cfg.white_light else 3
    fan = cfg.env_res * cfg.env_res
    env = jax.random.normal(k1, (cfg.env_res, cfg.env_res, cdim)) \
        * math.sqrt(2.0 / (fan + cdim))          # xavier-ish
    dims = [cfg.input_dim] + [cfg.hidden] * (cfg.num_layers - 1) + [5]
    return {"env_map": env, "brdf_net": init_mlp(k2, dims, bias=True)}


def apply(params, geo_feat, normals, view_dirs, cfg: EnvmapLightConfig,
          *, normal_coarse=None, gamma=None, env_import=None, **_):
    """Shade points -> (full, specular, diffuse, albedo)."""
    env = params["env_map"] if env_import is None else env_import
    dirs, areas = gen_light_dirs(cfg.env_res, cfg.env_res)
    l = jnp.asarray(dirs.reshape(-1, 3))                 # [K, 3]
    area = jnp.asarray(areas.reshape(-1, 1))

    brdf = apply_mlp(params["brdf_net"], geo_feat)
    k_d = jax.nn.sigmoid(brdf[..., :3])
    k_s = jax.nn.sigmoid(brdf[..., 3:4])
    gloss = jax.nn.softplus(brdf[..., 4:5]) + cfg.min_glossiness

    v = -view_dirs[:, None, :]                           # [N, 1, 3]
    h = l[None] + v
    h = h / (jnp.linalg.norm(h, axis=-1, keepdims=True) + 1e-5)
    nl = jnp.clip(jnp.sum(normals[:, None, :] * l[None], -1,
                          keepdims=True), 0.0, 1.1)
    nh = jnp.clip(jnp.sum(normals[:, None, :] * h, -1, keepdims=True),
                  0.0, 1.1)

    if normal_coarse is not None:
        vis = (jnp.sum(normal_coarse[:, None, :] * l[None], -1,
                       keepdims=True) > 0).astype(nl.dtype)
    else:
        vis = jnp.ones_like(nl)

    light = (jax.nn.softplus(env).reshape(-1, env.shape[-1]) * area)
    diffuse = jnp.sum(k_d[:, None, :] * nl * light[None] * vis, axis=1)
    if cfg.use_specular:
        specular = jnp.sum(
            k_s[:, None, :] * jnp.power(nh, gloss[:, None, :])
            * light[None] * vis, axis=1)
        specular = jnp.broadcast_to(specular, diffuse.shape)
    else:
        specular = jnp.zeros_like(diffuse)

    color = jnp.clip(diffuse + specular, 0.0, None)
    g = cfg.gamma if gamma is None else gamma
    return (safe_pow(color, 1.0 / g),
            safe_pow(jnp.clip(specular, 0, 1), 1.0 / g),
            safe_pow(jnp.clip(diffuse, 0, 1), 1.0 / g),
            jnp.clip(k_d, 0.0, 1.0))
