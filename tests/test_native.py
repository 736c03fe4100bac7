"""Native C++ grid builders: availability + parity with numpy fallback."""

import numpy as np

from nerf_texture_tpu import native
from nerf_texture_tpu.geometry.mesh import make_icosphere


def test_native_builds_and_matches_numpy():
    assert native.available(), "g++ build of spatial_build.cpp failed"
    sph = make_icosphere(2, radius=0.8)
    verts = sph.vertices
    res, mpc = 8, 16
    lo = verts.min(0) - 1e-3
    cs = float((verts.max(0) + 1e-3 - lo).max() / res)

    got = native.build_vertex_grid(verts, res, lo, cs, mpc)
    # numpy reference
    coords = np.clip(((verts - lo) / cs).astype(np.int64), 0, res - 1)
    flat = (coords[:, 0] * res + coords[:, 1]) * res + coords[:, 2]
    ref = -np.ones((res ** 3, mpc), np.int32)
    fill = np.zeros(res ** 3, np.int64)
    for i in np.argsort(flat, kind="stable"):
        c = flat[i]
        if fill[c] < mpc:
            ref[c, fill[c]] = i
            fill[c] += 1
    np.testing.assert_array_equal(got, ref)


def test_native_triangle_grid_conservative():
    assert native.available()
    sph = make_icosphere(2, radius=0.8)
    res, mpc = 8, 32
    tris = sph.vertices[sph.faces]
    lo = tris.reshape(-1, 3).min(0) - 1e-3
    cs = float((tris.reshape(-1, 3).max(0) + 1e-3 - lo).max() / res)
    got = native.build_triangle_grid(sph.vertices, sph.faces, res, lo,
                                     cs, mpc)
    # every face appears in the cell containing its centroid
    cen = tris.mean(1)
    coords = np.clip(((cen - lo) / cs).astype(np.int64), 0, res - 1)
    flat = (coords[:, 0] * res + coords[:, 1]) * res + coords[:, 2]
    for fi in range(0, len(tris), 7):
        assert fi in got[flat[fi]], fi
