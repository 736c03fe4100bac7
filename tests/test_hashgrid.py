import numpy as np
import jax
import jax.numpy as jnp

from nerf_texture_tpu.ops import HashGridSpec, hash_encode

from oracles import hashgrid_oracle


def make_spec(**kw):
    base = dict(input_dim=3, num_levels=4, level_dim=2, base_resolution=4,
                log2_hashmap_size=7, per_level_scale=2.0)
    base.update(kw)
    return HashGridSpec(**base)


def test_offsets_match_reference_logic():
    spec = HashGridSpec(input_dim=3, num_levels=16, level_dim=2,
                        base_resolution=16, log2_hashmap_size=19,
                        desired_resolution=2048)
    # per-level table sizes: min(2^19, (res+1)^3) rounded up to 8
    assert spec.offsets[0] == 0
    assert spec.level_params(0) == int(np.ceil(17 ** 3 / 8) * 8)
    assert spec.level_params(15) == 2 ** 19
    assert abs(spec.per_level_scale
               - np.exp2(np.log2(2048 / 16) / 15)) < 1e-12


def test_forward_matches_oracle_hash():
    spec = make_spec()
    key = jax.random.PRNGKey(0)
    emb = spec.init(key, std=0.5)
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, size=(32, 3)).astype(np.float32)
    out = np.asarray(hash_encode(jnp.asarray(x), emb, spec))
    ref = hashgrid_oracle(x, np.asarray(emb), spec)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_forward_matches_oracle_tiled_2d():
    spec = make_spec(input_dim=2, gridtype="tiled", num_levels=3,
                     align_corners=True)
    emb = spec.init(jax.random.PRNGKey(2), std=0.5)
    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, size=(16, 2)).astype(np.float32)
    out = np.asarray(hash_encode(jnp.asarray(x), emb, spec))
    ref = hashgrid_oracle(x, np.asarray(emb), spec)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_oob_encodes_to_zero():
    spec = make_spec()
    emb = spec.init(jax.random.PRNGKey(0), std=0.5)
    x = jnp.asarray([[1.5, 0.5, 0.5], [-0.1, 0.2, 0.3]])
    out = hash_encode(x, emb, spec)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_input_gradients_finite_difference():
    spec = make_spec()
    emb = spec.init(jax.random.PRNGKey(0), std=0.5)

    def f(x):
        return jnp.sum(hash_encode(x, emb, spec) ** 2)

    x = jnp.asarray([[0.31, 0.57, 0.73]])
    g = jax.grad(f)(x)
    eps = 1e-4
    for d in range(3):
        xp = x.at[0, d].add(eps)
        xm = x.at[0, d].add(-eps)
        fd = (f(xp) - f(xm)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[0, d]), np.asarray(fd),
                                   rtol=2e-2, atol=1e-4)


def test_embedding_gradients_are_deterministic_scatter():
    spec = make_spec()
    emb = spec.init(jax.random.PRNGKey(0), std=0.5)
    x = jnp.asarray(np.random.default_rng(5).uniform(0, 1, (64, 3)),
                    dtype=jnp.float32)

    def loss(e):
        return jnp.sum(hash_encode(x, e, spec))

    g1 = jax.grad(loss)(emb)
    g2 = jax.grad(loss)(emb)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    # every point contributes total weight 1 per level per channel
    np.testing.assert_allclose(np.asarray(jnp.sum(g1)),
                               64 * spec.num_levels * spec.level_dim,
                               rtol=1e-4)


def test_double_backward_works():
    """grad-of-grad through the encoder (needed for -grad(sigma) normals
    supervised by a loss, nerf/network_curvedfield.py:248-257)."""
    spec = make_spec()
    emb = spec.init(jax.random.PRNGKey(0), std=0.5)

    def sigma(x):
        return jnp.sum(hash_encode(x, emb, spec) ** 2)

    def normal_loss(x):
        n = jax.grad(sigma)(x)
        return jnp.sum(n ** 2)

    x = jnp.asarray([0.31, 0.57, 0.73])
    g = jax.grad(normal_loss)(x)
    assert np.all(np.isfinite(np.asarray(g)))
