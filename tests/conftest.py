"""Test configuration: force JAX onto a virtual 8-device CPU backend.

Multi-chip sharding logic is exercised on host CPU devices
(``xla_force_host_platform_device_count=8``), the TPU-world equivalent of a
fake backend (SURVEY.md section 4).  Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The container's sitecustomize registers the TPU (axon) plugin at
# interpreter startup, so the env var alone may be read too late --
# force the platform through the config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent CPU compile cache: the suite's wall time on the single host
# core is dominated by XLA compiles; repeat runs hit the cache.  Keys
# include the backend, so this never collides with the TPU cache.
from nerf_texture_tpu.utils.misc import machine_scoped_cache_dir  # noqa: E402

# machine-scoped: a foreign host loading this cache's CPU machine code
# segfaults (see machine_scoped_cache_dir)
jax.config.update("jax_compilation_cache_dir",
                  machine_scoped_cache_dir(
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache_cpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# ---------------------------------------------------------------------------
# Heavy-fixture memoization (VERDICT r3 next #7): icospheres, projectors
# and synthetic datasets are rebuilt with identical parameters by dozens
# of tests; construction (subdivision, UV atlas, grid build, analytic GT
# rendering) is pure host work safe to share across tests.
# ---------------------------------------------------------------------------

def _install_fixture_caches():
    import functools

    from nerf_texture_tpu.data import synthetic as _syn
    from nerf_texture_tpu.geometry import mesh as _mesh_mod
    from nerf_texture_tpu.geometry import projector as _proj_mod

    _orig_ico = _mesh_mod.make_icosphere
    _ico_cache = {}

    @functools.wraps(_orig_ico)
    def make_icosphere_cached(subdivisions=2, radius=1.0):
        key = (subdivisions, float(radius))
        m = _ico_cache.get(key)
        if m is None:
            m = _ico_cache[key] = _orig_ico(subdivisions, radius)
        # fresh Mesh: tests may displace vertices / attach uvs
        return _mesh_mod.Mesh(m.vertices.copy(), m.faces.copy(),
                              None if m.uvs is None else m.uvs.copy())

    _mesh_mod.make_icosphere = make_icosphere_cached

    _orig_proj = _proj_mod.MeshProjector
    _proj_cache = {}

    class MeshProjectorCached(_orig_proj):
        def __new__(cls, mesh, **kw):
            key = (mesh.vertices.tobytes(), mesh.faces.tobytes(),
                   None if mesh.uvs is None else mesh.uvs.tobytes(),
                   tuple(sorted(kw.items())))
            hit = _proj_cache.get(key)
            if hit is not None:
                return hit
            obj = _orig_proj(mesh, **kw)
            if len(_proj_cache) < 32:
                _proj_cache[key] = obj
            return obj

        def __init__(self, mesh, **kw):   # __new__ did the work
            pass

    _proj_mod.MeshProjector = MeshProjectorCached

    for cls_name in ("SyntheticSphereDataset", "SyntheticShellDataset"):
        orig_cls = getattr(_syn, cls_name)
        cache = {}

        def make(*args, orig_cls=orig_cls, cache=cache, **kw):
            key = (args, tuple(sorted(kw.items())))
            ds = cache.get(key)
            if ds is None and len(cache) < 16:
                ds = cache[key] = orig_cls(*args, **kw)
            return ds if ds is not None else orig_cls(*args, **kw)

        setattr(_syn, cls_name, make)


_install_fixture_caches()


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled-executable references between test modules.

    The XLA:CPU compiler segfaults (in compile AND in cache-load) on
    programs that compile fine in a fresh process, once ~100 programs
    have been compiled in-process (reproduced deterministically on the
    full suite at tests/test_mesh_field.py::test_trainer_level_advance;
    either half of the suite passes).  Dropping the in-memory caches
    between modules bounds the accumulated compiler state; repeated
    programs re-load from the persistent on-disk cache."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()
