import numpy as np
import jax
import jax.numpy as jnp

from nerf_texture_tpu.ops import composite_rays, composite_with_background

from oracles import composite_oracle, composite_backward_oracle


def make_case(seed=0, N=8, K=16):
    rng = np.random.default_rng(seed)
    sigmas = rng.uniform(0, 20, (N, K)).astype(np.float64)
    rgbs = rng.uniform(0, 1, (N, K, 3)).astype(np.float64)
    dts = rng.uniform(0.01, 0.05, (N, K)).astype(np.float64)
    ts = np.cumsum(dts, axis=-1)
    mask = rng.uniform(size=(N, K)) < 0.7
    # make masked entries contiguous-prefix in some rows, scattered in others
    mask[0] = True
    mask[1] = False
    return sigmas, rgbs, dts, ts, mask


def test_forward_matches_oracle():
    sigmas, rgbs, dts, ts, mask = make_case()
    res = composite_rays(jnp.asarray(sigmas), jnp.asarray(rgbs),
                         jnp.asarray(dts), jnp.asarray(ts),
                         jnp.asarray(mask))
    img_ref, depth_ref, ws_ref = composite_oracle(sigmas, rgbs, dts, ts,
                                                  mask)
    np.testing.assert_allclose(np.asarray(res.image), img_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.depth), depth_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.weights_sum), ws_ref,
                               atol=1e-5)


def test_backward_matches_reference_analytic():
    sigmas, rgbs, dts, ts, mask = make_case(seed=3)
    g_img = np.random.default_rng(7).normal(size=(8, 3))
    g_ws = np.random.default_rng(8).normal(size=(8,))

    def loss(sig, rgb):
        res = composite_rays(sig, rgb, jnp.asarray(dts), jnp.asarray(ts),
                             jnp.asarray(mask))
        return (jnp.sum(res.image * jnp.asarray(g_img))
                + jnp.sum(res.weights_sum * jnp.asarray(g_ws)))

    gs, gr = jax.grad(loss, argnums=(0, 1))(jnp.asarray(sigmas),
                                            jnp.asarray(rgbs))
    gs_ref, gr_ref = composite_backward_oracle(g_img, g_ws, sigmas, rgbs,
                                               dts, ts, mask)
    np.testing.assert_allclose(np.asarray(gs), gs_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gr), gr_ref, atol=1e-5)


def test_background_blend():
    sigmas, rgbs, dts, ts, mask = make_case(seed=5)
    res = composite_rays(jnp.asarray(sigmas), jnp.asarray(rgbs),
                         jnp.asarray(dts), jnp.asarray(ts),
                         jnp.asarray(mask))
    img = composite_with_background(res, jnp.asarray([1.0, 1.0, 1.0]))
    # empty ray (row 1, all masked) -> pure background
    np.testing.assert_allclose(np.asarray(img[1]), 1.0, atol=1e-6)
    assert np.all(np.asarray(img) <= 1.0 + 1e-5)


def test_opaque_ray_saturates():
    K = 32
    sigmas = jnp.full((1, K), 1e4)
    rgbs = jnp.full((1, K, 3), 0.5)
    dts = jnp.full((1, K), 0.01)
    ts = jnp.cumsum(dts, axis=-1)
    mask = jnp.ones((1, K), bool)
    res = composite_rays(sigmas, rgbs, dts, ts, mask)
    np.testing.assert_allclose(float(res.weights_sum[0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.image[0]), 0.5, atol=1e-5)
