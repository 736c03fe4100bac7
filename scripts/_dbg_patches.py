"""Replay patch-sampling ray casts from .bench/patch_debug.pkl (dumped
by sample_patches under NERF_TPU_DEBUG_PATCHES=1) and compare the DDA
grid caster against a brute-force numpy Moller-Trumbore oracle to decide
caster bug vs geometry.
Run: python scripts/_dbg_patches.py
"""
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

with open("/root/repo/.bench/patch_debug.pkl", "rb") as fh:
    d = pickle.load(fh)

from nerf_texture_tpu.geometry import projector as proj
from nerf_texture_tpu.geometry.mesh import Mesh
from nerf_texture_tpu.geometry.projector import MeshProjector

V, F = d["proj_vertices"], d["proj_faces"]
print(f"proj mesh: {len(V)} verts {len(F)} faces "
      f"vrange {V.min(0).round(3)}..{V.max(0).round(3)}")
print(f"mfs mesh:  {len(d['mfs_vertices'])} verts "
      f"{len(d['mfs_faces'])} faces")
print(f"grid_gap {d['grid_gap']:.5f} patch_len {d['patch_len']:.5f} "
      f"h_threshold {d['h_threshold']:.4f}")

mesh = Mesh(V, F)
mp = MeshProjector(mesh)

centers = d["centers"]
normals = d["v_normals"]
ps = 8
cal = np.linspace(-d["patch_len"] / 2, d["patch_len"] / 2, ps)
gx, gy = np.meshgrid(cal, cal, indexing="ij")
texels = np.stack([gx.ravel(), gy.ravel(), np.zeros(ps * ps)], -1)
first = d["first"]


def brute_cast(o, dr):
    """numpy Moller-Trumbore over ALL faces; returns depth or 10."""
    v0 = V[F[:, 0]]
    e1 = V[F[:, 1]] - v0
    e2 = V[F[:, 2]] - v0
    pvec = np.cross(dr, e2)                    # [F, 3]
    det = (e1 * pvec).sum(-1)
    ok = np.abs(det) > 1e-10
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    tvec = o - v0
    u = (tvec * pvec).sum(-1) * inv
    qvec = np.cross(tvec, e1)
    v = (dr * qvec).sum(-1) * inv
    t = (e2 * qvec).sum(-1) * inv
    hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 1e-6)
    return t[hit].min() if hit.any() else 10.0


n_show = 6
for i in range(n_show):
    c, z = centers[i], normals[i]
    y = np.cross(z, first)
    if np.abs(y).sum() < 1e-12:
        y = np.cross(z, np.array([1.0, 1.0, 1.01]) * first)
    y /= np.linalg.norm(y)
    x = np.cross(y, z)
    R = np.stack([x, y, z], -1)
    orig = texels @ R.T + c + 0.1 * z
    dirs = np.broadcast_to(-z, orig.shape)
    _, _, depth, _ = proj.raycast(
        mp.arrays.tgrid, mp.arrays.vertices, mp.arrays.faces,
        jnp.asarray(orig, jnp.float32), jnp.asarray(dirs, jnp.float32))
    depth = np.asarray(depth)
    miss = depth >= 9.5
    bf = np.array([brute_cast(orig[j], dirs[j])
                   for j in range(ps * ps)])
    bf_miss = bf >= 9.5
    both = miss & bf_miss
    dda_only = miss & ~bf_miss
    print(f"center {i}: |c|={np.linalg.norm(c):.3f} n.c_hat="
          f"{float(z @ (c / np.linalg.norm(c))):.3f} "
          f"dda-miss {miss.sum()}/64 brute-miss {bf_miss.sum()}"
          f" dda-only-miss {dda_only.sum()}")
    if dda_only.any():
        j = int(np.where(dda_only)[0][0])
        print(f"  dda-only miss ray: o={orig[j].round(4)} "
              f"d={dirs[j].round(4)} brute depth={bf[j]:.4f}")
    agree = (~miss & ~bf_miss)
    if agree.any():
        j = int(np.where(agree)[0][0])
        print(f"  agree hit: dda={depth.reshape(-1)[j]:.4f} "
              f"brute={bf[j]:.4f}")
