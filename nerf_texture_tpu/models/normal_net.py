"""Factorized fine-normal network with Lipschitz-regularized MLPs.

Rebuild of the reference ``Factorized_Normal_Net`` (tools/map.py:231-337)
and ``LipMLP``/``LipLayer`` (tools/map.py:189-228):

* phi (azimuthal rotation in the local TBN frame) is anisotropic: predicted
  from its OWN hash grid over surface points plus the low-frequency z
  bands;
* theta (polar tilt) is isotropic: predicted from the low-frequency x/z
  feature bands;
* the fine normal = R(theta, phi) rotated into the local TBN frame.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.hashgrid_packed import PackedGridSpec, packed_encode_bound


# ---------------------------------------------------------------------------
# Lipschitz MLP
# ---------------------------------------------------------------------------

def init_lip_mlp(key, in_dim: int, out_dim: int, n_neurons: int = 16,
                 num_layers: int = 2):
    """LipMLP params (tools/map.py:189-217): num_layers hidden LipLayers
    + one linear LipLayer head; W ~ N(0, 0.1), b = 0, c = 1."""
    layers = []
    dims = [in_dim] + [n_neurons] * num_layers + [out_dim]
    for i in range(len(dims) - 1):
        key, k = jax.random.split(key)
        layers.append({
            "w": 0.1 * jax.random.normal(k, (dims[i], dims[i + 1])),
            "b": jnp.zeros((dims[i + 1],)),
            "c": jnp.ones(()),
        })
    return layers


def apply_lip_mlp(layers, x):
    """Row-sum-normalized weights: W * min(1, softplus(c)/sum|W_row|)
    (tools/map.py:220-228); ReLU between layers, linear head."""
    h = x
    n = len(layers)
    for i, lyr in enumerate(layers):
        absrowsum = jnp.sum(jnp.abs(lyr["w"]), axis=0)  # out-dim sums
        scale = jnp.minimum(1.0, jax.nn.softplus(lyr["c"])
                            / (absrowsum + 1e-12))
        h = h @ (lyr["w"] * scale[None, :]) + lyr["b"]
        if i < n - 1:
            h = jax.nn.relu(h)
    return h


def lip_regularization(layers):
    """prod softplus(c) over layers (tools/map.py:204-208)."""
    loss = 1.0
    for lyr in layers:
        loss = loss * jax.nn.softplus(lyr["c"])
    return loss


# ---------------------------------------------------------------------------
# factorized normal net
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class NormalNetConfig:
    x_dim: int = 16                    # feature embedding width
    z_dim: int = 25                    # height embedding width
    theta_scale: float = math.pi / 2 * 1.1
    phi_scale: float = math.pi * 2 * 1.1
    bound_output: bool = False
    lip: bool = True
    low_freq_band_len_f: int = 32
    low_freq_band_len_z: int = 12
    n_neurons: int = 16
    num_layers: int = 2
    bound: float = 1.0

    @property
    def band_x(self) -> int:
        return min(self.x_dim, self.low_freq_band_len_f)

    @property
    def band_z(self) -> int:
        return min(self.z_dim, self.low_freq_band_len_z)

    @property
    def phi_grid_spec(self) -> PackedGridSpec:
        # hash grid over surface points: 4 levels x 2ch, 512 -> 1024
        # (tools/map.py:235)
        return PackedGridSpec(input_dim=3, num_levels=4, level_dim=2,
                              base_resolution=512, desired_resolution=1024,
                              log2_bricks=16, align_corners=True)

    @property
    def phi_embed_dim(self) -> int:
        return self.phi_grid_spec.output_dim


def init(key, cfg: NormalNetConfig) -> dict[str, Any]:
    k_grid, k_phi, k_theta = jax.random.split(key, 3)
    params = {
        "phi_grid": cfg.phi_grid_spec.init(k_grid),
        "phi_net": init_lip_mlp(k_phi, cfg.phi_embed_dim + cfg.band_z, 1,
                                cfg.n_neurons, cfg.num_layers),
        "theta_net": init_lip_mlp(k_theta, cfg.band_x + cfg.band_z, 1,
                                  cfg.n_neurons, cfg.num_layers),
    }
    # first parameter initialised ~ U(0, 1e-3) (tools/map.py:595)
    params["phi_grid"] = jax.random.uniform(
        k_grid, params["phi_grid"].shape, minval=0.0, maxval=1e-3)
    return params


def phi_embedding(params, p_sur, cfg: NormalNetConfig,
                  amp: bool = False):
    return packed_encode_bound(p_sur, params["phi_grid"],
                               cfg.phi_grid_spec, bound=cfg.bound,
                               amp=amp)


def to_coord(phi, theta):
    """Spherical (phi, theta) -> unit vector, z-up local frame
    (tools/map.py:300-302)."""
    sin_t = jnp.sin(theta)
    return jnp.concatenate(
        [sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), jnp.cos(theta)],
        axis=-1)


def apply(params, z_embed, x_embed, cfg: NormalNetConfig, *, p_sur=None,
          phi_embed=None, tbn=None, return_rot_angles: bool = False):
    """Predict the fine normal (tools/map.py:313-337).

    Exactly one of p_sur / phi_embed must be given.  With tbn [N, 3, 3],
    the normal is rotated into the local frame.
    """
    if phi_embed is None:
        phi_embed = phi_embedding(params, p_sur, cfg)
    geo = jnp.concatenate([x_embed[..., :cfg.band_x],
                           z_embed[..., :cfg.band_z]], axis=-1)
    phi = apply_lip_mlp(params["phi_net"],
                        jnp.concatenate([phi_embed,
                                         z_embed[..., :cfg.band_z]], -1))
    theta = apply_lip_mlp(params["theta_net"], geo)
    if cfg.bound_output:
        theta = cfg.theta_scale * jax.nn.sigmoid(theta)
        phi = cfg.phi_scale * jax.nn.sigmoid(phi)
    if return_rot_angles:
        return theta, phi
    normal = to_coord(phi, theta)
    if tbn is None:
        return normal
    return jnp.einsum("na,nab->nb", normal, tbn)


def regularization(params):
    return (lip_regularization(params["phi_net"])
            + lip_regularization(params["theta_net"]))
