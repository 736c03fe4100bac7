"""Curved-surface texture synthesis CLI
(reference texture_synthesis_on_curved_surface.py).

Synthesizes the sampled implicit patches onto a new target mesh's UV
atlas and writes curved_mesh.npz (ready for the GUI's 'import_unhash').

Usage:
  python texture_synthesis_on_curved_surface.py \
      logs/<scene>/field/<name>.npz path/to/target_mesh.obj \
      --grid_gap 5e-4 --out logs/<scene>/field/curved_mesh.npz
"""

import argparse
import os

import numpy as np

from nerf_texture_tpu.geometry import shape_tools
from nerf_texture_tpu.geometry.mesh import load_obj
from nerf_texture_tpu.geometry.projector import MeshProjector
from nerf_texture_tpu.synthesis.curved import (CurvedSynthesisConfig,
                                               augment_patches,
                                               define_vector_field,
                                               synthesis_on_uvmap,
                                               uv2vert)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("field_npz")
    p.add_argument("target_mesh")
    p.add_argument("--grid_gap", type=float, default=5e-4)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--no_mirror", action="store_true")
    p.add_argument("--no_crop_shift", action="store_true")
    p.add_argument("--preprocess", action="store_true",
                   help="CoACD + manifold + remesh + smooth the target")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    data = np.load(args.field_npz, allow_pickle=True)
    patches = augment_patches(
        data["patches"], mirror_hor=not args.no_mirror,
        mirror_vert=not args.no_mirror,
        crop_shift=not args.no_crop_shift)
    print("patch library:", patches.shape)

    mesh_path = args.target_mesh
    if args.preprocess:
        mesh_path = shape_tools.coacd(mesh_path)
        mesh_path = shape_tools.manifold_union(
            mesh_path, os.path.dirname(args.field_npz) or ".")
    mesh = load_obj(mesh_path)
    if args.preprocess:
        mesh = shape_tools.remesh_isotropic(mesh)
        mesh = shape_tools.laplacian_smooth(mesh)
    mesh = shape_tools.normalize_mesh(mesh, scale=1.5)

    mp = MeshProjector(mesh)
    verts, vert_ids, res = uv2vert(mp, resolution=args.resolution)
    vectors = define_vector_field(mp.mesh)
    cfg = CurvedSynthesisConfig(grid_gap=args.grid_gap,
                                resolution=args.resolution)
    out = synthesis_on_uvmap(mp, verts, vert_ids, res, patches, vectors,
                             original_grid_gap=float(data["grid_gap"]),
                             cfg=cfg, progress=True)
    out_path = args.out or os.path.join(
        os.path.dirname(args.field_npz), "curved_mesh.npz")
    np.savez(out_path, **{k: v for k, v in out.items() if v is not None})
    print("saved", out_path)


if __name__ == "__main__":
    main()
