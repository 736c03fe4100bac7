"""Vectorized ray-triangle and point-triangle primitives.

These replace the reference's CUDA BVH traversal leaves
(``external/RayTracer/src/bvh.cu:257-302`` ray cast, pytorch3d
``point_face_dist_forward`` at ``tools/map.py:78``) -- on TPU the win comes
from evaluating *batches* of candidate triangles per query with pure vector
math rather than from tree traversal.
"""

from __future__ import annotations

import jax.numpy as jnp


def moller_trumbore(ray_o, ray_d, v0, v1, v2, eps: float = 1e-9):
    """Batched ray-triangle intersection.

    Args:
      ray_o, ray_d: [..., 3].
      v0, v1, v2: [..., 3] triangle vertices (broadcastable with rays).

    Returns:
      (t, hit): [...] intersection distance (+inf on miss) and bool mask.
      Only t >= 0 counts as a hit (rays, not lines).
    """
    e1 = v1 - v0
    e2 = v2 - v0
    pvec = jnp.cross(ray_d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
    tvec = ray_o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(ray_d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = ((jnp.abs(det) > eps) & (u >= -eps) & (v >= -eps)
           & (u + v <= 1.0 + eps) & (t >= 0.0))
    return jnp.where(hit, t, jnp.inf), hit


def point_triangle_closest(p, v0, v1, v2):
    """Closest point on triangle(s) to point(s).

    Standard region-partition algorithm (Ericson, Real-Time Collision
    Detection 5.1.5) in branch-free form.

    Args:
      p: [..., 3]; v0, v1, v2: [..., 3] (broadcastable).

    Returns:
      (dist_sq [...], closest [..., 3], bary [..., 3])
    """
    ab = v1 - v0
    ac = v2 - v0
    ap = p - v0

    d1 = jnp.sum(ab * ap, axis=-1)
    d2 = jnp.sum(ac * ap, axis=-1)

    bp = p - v1
    d3 = jnp.sum(ab * bp, axis=-1)
    d4 = jnp.sum(ac * bp, axis=-1)

    cp = p - v2
    d5 = jnp.sum(ab * cp, axis=-1)
    d6 = jnp.sum(ac * cp, axis=-1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom_face = va + vb + vc
    # interior barycentrics (guarded)
    v_face = vb / jnp.where(jnp.abs(denom_face) > 1e-20, denom_face, 1.0)
    w_face = vc / jnp.where(jnp.abs(denom_face) > 1e-20, denom_face, 1.0)

    # edge AB
    t_ab = d1 / jnp.where(jnp.abs(d1 - d3) > 1e-20, d1 - d3, 1.0)
    t_ab = jnp.clip(t_ab, 0.0, 1.0)
    # edge AC
    t_ac = d2 / jnp.where(jnp.abs(d2 - d6) > 1e-20, d2 - d6, 1.0)
    t_ac = jnp.clip(t_ac, 0.0, 1.0)
    # edge BC
    t_bc = (d4 - d3) / jnp.where(
        jnp.abs((d4 - d3) + (d5 - d6)) > 1e-20, (d4 - d3) + (d5 - d6), 1.0)
    t_bc = jnp.clip(t_bc, 0.0, 1.0)

    # vertex regions
    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (~in_a) & (~in_b) & (~in_c) & (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (~in_a) & (~in_b) & (~in_c) & (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = ((~in_a) & (~in_b) & (~in_c)
             & (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0))

    u = jnp.where(in_a, 1.0,
        jnp.where(in_b, 0.0,
        jnp.where(in_c, 0.0,
        jnp.where(on_ab, 1.0 - t_ab,
        jnp.where(on_ac, 1.0 - t_ac,
        jnp.where(on_bc, 0.0, 1.0 - v_face - w_face))))))
    v = jnp.where(in_a, 0.0,
        jnp.where(in_b, 1.0,
        jnp.where(in_c, 0.0,
        jnp.where(on_ab, t_ab,
        jnp.where(on_ac, 0.0,
        jnp.where(on_bc, 1.0 - t_bc, v_face))))))
    w = 1.0 - u - v

    bary = jnp.stack([u, v, w], axis=-1)
    closest = (u[..., None] * v0 + v[..., None] * v1 + w[..., None] * v2)
    dist_sq = jnp.sum((p - closest) ** 2, axis=-1)
    return dist_sq, closest, bary


def points_to_barycentric(triangles, points, eps: float = 1e-5):
    """Barycentric coords by sub-triangle areas (tools/map.py:85-93).

    triangles: [..., 3, 3]; points: [..., 3].
    """
    p2v = triangles - points[..., None, :]
    s0 = jnp.linalg.norm(
        jnp.cross(p2v[..., 1, :], p2v[..., 2, :]), axis=-1)
    s1 = jnp.linalg.norm(
        jnp.cross(p2v[..., 2, :], p2v[..., 0, :]), axis=-1)
    s2 = jnp.linalg.norm(
        jnp.cross(p2v[..., 0, :], p2v[..., 1, :]), axis=-1)
    bary = jnp.stack([s0, s1, s2], axis=-1)
    return bary / (jnp.sum(bary, axis=-1, keepdims=True) + eps)
