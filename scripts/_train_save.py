import sys, pickle
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nerf_texture_tpu.data.synthetic import SyntheticSphereDataset
from nerf_texture_tpu.models.ngp import NGPConfig
from nerf_texture_tpu.render.renderer import RenderConfig
from nerf_texture_tpu.train import trainer as T

H = W = 800
ds = SyntheticSphereDataset(n_frames=8, H=H, W=W)
mcfg = NGPConfig(bound=1.0, num_levels=8, level_dim=4,
                 log2_bricks=16, desired_resolution=2048)
rcfg = RenderConfig(bound=1.0, cascades=1, grid_size=128,
                    max_steps=384, max_samples_train=192,
                    max_samples_infer=96, ray_chunk=40000,
                    pool_mean_samples=64, pool_mean_samples_infer=24)
tcfg = T.TrainConfig(lr=1e-2, total_steps=3000, num_rays=4096,
                     grid_decay=0.9)
tr = T.Trainer(ds, mcfg, rcfg, tcfg, key=jax.random.PRNGKey(7))
tr.train(2500)
state = {
    "params": jax.tree.map(np.asarray, tr.state.params),
    "density": np.asarray(tr.state.occ.density),
    "occ": np.asarray(tr.state.occ.occ),
    "mean_density": np.asarray(tr.state.occ.mean_density),
}
with open("/tmp/ngp_trained.pkl", "wb") as fh:
    pickle.dump(state, fh)
print("saved; occ frac", state["occ"].mean())
