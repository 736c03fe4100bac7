"""Measure curved grid-refresh time: exact projection chain vs the
anchor-table fast path, at production scale (grid 128, icosphere(4))."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

from nerf_texture_tpu.geometry.mesh import make_icosphere  # noqa: E402
from nerf_texture_tpu.geometry.projector import (MeshProjector,  # noqa: E402
                                                 build_anchor_table)
from nerf_texture_tpu.models import mesh_field  # noqa: E402
from nerf_texture_tpu.models.curved_field import CurvedFieldConfig  # noqa: E402
from nerf_texture_tpu.models.mesh_field import MeshFieldConfig  # noqa: E402
from nerf_texture_tpu.render.renderer import RenderConfig  # noqa: E402
from nerf_texture_tpu.train.curved_trainer import (  # noqa: E402
    CurvedTrainConfig, compute_near_cells, curved_grid_step, init_state)


def main():
    mp = MeshProjector(make_icosphere(4, radius=0.5))
    state = mesh_field.make_state(mp)
    ccfg = CurvedFieldConfig(field=MeshFieldConfig(), light_model="SH")
    rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=128, max_steps=512,
                        max_samples_train=128)
    tcfg = CurvedTrainConfig(lr=1e-2, total_steps=4000, num_rays=4096)
    tst = init_state(jax.random.PRNGKey(0), ccfg, rcfg, tcfg, 1)
    near = compute_near_cells(np.asarray(mp.arrays.vertices),
                              rcfg.grid_size, rcfg.bound,
                              ccfg.field.h_threshold)
    print(f"near cells: {len(near)}", flush=True)

    t0 = time.perf_counter()
    cell = 2.0 * rcfg.bound / rcfg.grid_size
    tab = build_anchor_table(
        mp.arrays, rcfg.grid_size, rcfg.bound, k=ccfg.field.k,
        max_dist=4.0 * ccfg.field.h_threshold + 2.0 * cell)
    tab.block_until_ready()
    print(f"anchor table build: {time.perf_counter() - t0:.2f}s",
          flush=True)

    for name, kw in [("anchored", dict(anchor_tab=tab)), ("exact", {})]:
        key = jax.random.PRNGKey(1)
        out = curved_grid_step(tst, state, key, ccfg=ccfg, rcfg=rcfg,
                               near_cells=near, **kw)    # compile
        np.asarray(out.occ.occ[:1])
        t0 = time.perf_counter()
        for i in range(3):
            out = curved_grid_step(tst, state, jax.random.PRNGKey(2 + i),
                                   ccfg=ccfg, rcfg=rcfg, near_cells=near,
                                   **kw)
        np.asarray(out.occ.occ[:1])
        dt = (time.perf_counter() - t0) / 3
        print(f"{name} refresh: {dt * 1000:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
