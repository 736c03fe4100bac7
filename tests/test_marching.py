import numpy as np
import jax
import jax.numpy as jnp

from nerf_texture_tpu.ops import march_rays, near_far_from_aabb, sample_points
from nerf_texture_tpu.ops.marching import _t_sequence

from oracles import march_oracle


def test_near_far_matches_bruteforce():
    rng = np.random.default_rng(0)
    o = rng.normal(size=(128, 3)).astype(np.float32) * 2
    d = rng.normal(size=(128, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    aabb = jnp.asarray([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    near, far = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), aabb,
                                   min_near=0.05)
    near, far = np.asarray(near), np.asarray(far)
    # brute force: sample t densely and check inside-box interval
    ts = np.linspace(0.0, 20.0, 20001)
    for i in range(64):
        pts = o[i] + ts[:, None] * d[i]
        inside = np.all(np.abs(pts) <= 1.0 + 1e-6, axis=-1)
        if not inside.any() or near[i] >= far[i]:
            assert near[i] == far[i] == 0.0 or not inside[ts >= 0.05].any()
            continue
        t_in = ts[inside]
        assert abs(max(t_in.min(), 0.05) - near[i]) < 2e-3
        assert abs(t_in.max() - far[i]) < 2e-3


def test_t_sequence_matches_sequential():
    t0 = jnp.asarray([0.3, 0.5])
    dt_gamma, dt_min, dt_max, S = 1 / 128, 0.01, 0.1, 64
    ts, dts = _t_sequence(t0, None, dt_gamma=dt_gamma, dt_min=dt_min,
                          dt_max=dt_max, num_steps=S)
    for n in range(2):
        t = float(t0[n])
        for i in range(S):
            dt = np.clip(t * dt_gamma, dt_min, dt_max)
            assert abs(float(ts[n, i]) - t) < 1e-5
            assert abs(float(dts[n, i]) - dt) < 1e-6
            t += dt


def test_march_matches_oracle():
    H, cascades, bound, S, K = 16, 1, 1.0, 128, 64
    rng = np.random.default_rng(2)
    occ = (rng.uniform(size=(cascades * H ** 3,)) < 0.2).astype(np.uint8)

    o = np.array([[0.0, 0.0, -2.0], [0.5, 0.2, -2.0], [2.0, 2.0, 2.0]],
                 np.float32)
    d = np.array([[0.0, 0.0, 1.0], [-0.1, 0.05, 1.0], [1.0, 0.0, 0.0]],
                 np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    aabb = jnp.asarray([-bound] * 3 + [bound] * 3)
    near, far = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), aabb)
    res = march_rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(occ),
                     near, far, bound=bound, cascades=cascades, grid_size=H,
                     max_steps=S, max_samples=K, dt_gamma=0.0)
    near, far = np.asarray(near), np.asarray(far)
    for n in range(o.shape[0]):
        ts_ref, dts_ref = march_oracle(
            o[n], d[n], occ, near[n], far[n], bound=bound,
            cascades=cascades, grid_size=H, max_steps=S, dt_gamma=0.0)
        cnt = int(res.counts[n])
        assert cnt == min(len(ts_ref), K)
        np.testing.assert_allclose(np.asarray(res.ts[n, :cnt]),
                                   ts_ref[:cnt], atol=1e-4)
        np.testing.assert_allclose(np.asarray(res.dts[n, :cnt]),
                                   dts_ref[:cnt], atol=1e-5)
        assert not np.asarray(res.mask[n, cnt:]).any()


def test_march_with_gamma_matches_oracle():
    H, cascades, bound, S, K = 8, 2, 2.0, 96, 48
    rng = np.random.default_rng(4)
    occ = (rng.uniform(size=(cascades * H ** 3,)) < 0.3).astype(np.uint8)
    o = np.array([[0.1, -0.2, -3.0]], np.float32)
    d = np.array([[0.05, 0.02, 1.0]], np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    aabb = jnp.asarray([-bound] * 3 + [bound] * 3)
    near, far = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), aabb)
    res = march_rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(occ),
                     near, far, bound=bound, cascades=cascades, grid_size=H,
                     max_steps=S, max_samples=K, dt_gamma=1 / 64)
    ts_ref, dts_ref = march_oracle(
        o[0], d[0], occ, float(near[0]), float(far[0]), bound=bound,
        cascades=cascades, grid_size=H, max_steps=S, dt_gamma=1 / 64)
    cnt = int(res.counts[0])
    assert cnt == min(len(ts_ref), K)
    np.testing.assert_allclose(np.asarray(res.ts[0, :cnt]), ts_ref[:cnt],
                               atol=1e-4)


def test_march_empty_grid_gives_no_samples():
    H = 8
    occ = jnp.zeros((H ** 3,), jnp.uint8)
    o = jnp.asarray([[0.0, 0.0, -2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    aabb = jnp.asarray([-1.0] * 3 + [1.0] * 3)
    near, far = near_far_from_aabb(o, d, aabb)
    res = march_rays(o, d, occ, near, far, bound=1.0, cascades=1,
                     grid_size=H, max_steps=32, max_samples=16)
    assert int(res.counts[0]) == 0
    assert not np.asarray(res.mask).any()


def test_sample_points_on_ray():
    H = 8
    occ = jnp.ones((H ** 3,), jnp.uint8)
    o = jnp.asarray([[0.0, 0.0, -2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    aabb = jnp.asarray([-1.0] * 3 + [1.0] * 3)
    near, far = near_far_from_aabb(o, d, aabb)
    res = march_rays(o, d, occ, near, far, bound=1.0, cascades=1,
                     grid_size=H, max_steps=64, max_samples=64)
    pos, dirs = sample_points(o, d, res, bound=1.0)
    cnt = int(res.counts[0])
    assert cnt > 0
    p = np.asarray(pos[0, :cnt])
    np.testing.assert_allclose(p[:, :2], 0.0, atol=1e-6)
    assert np.all(np.diff(p[:, 2]) > 0)
    np.testing.assert_allclose(np.asarray(dirs[0, :cnt]),
                               np.asarray(d[0])[None].repeat(cnt, 0))


def test_trunc_exp_overflow_safe():
    """Forward saturates at exp(15) (the f32 analogue of the reference's
    fp16 autocast ceiling) so runaway densities cannot reach inf/NaN;
    backward stays finite and consistent (tools/activation.py parity)."""
    import jax
    import jax.numpy as jnp

    from nerf_texture_tpu.ops.activation import trunc_exp

    x = jnp.asarray([-100.0, -15.0, 0.0, 14.0, 15.0, 100.0, 3e38])
    y = trunc_exp(x)
    assert np.isfinite(np.asarray(y)).all()
    np.testing.assert_allclose(float(y[-1]), float(jnp.exp(15.0)),
                               rtol=1e-6)
    g = jax.grad(lambda v: jnp.sum(trunc_exp(v)))(x)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    # saturated inputs freeze (exact VJP of the clamped forward): a
    # phantom g*exp(15) there would dwarf every other gradient in the
    # batch and destroy shared hash rows (measured, docs/PERF.md)
    assert g[-1] == 0.0 and g[-2] == 0.0 and g[0] == 0.0
    np.testing.assert_allclose(g[2], 1.0, rtol=1e-6)     # exp(0)
    # in-range values keep exact exp semantics
    np.testing.assert_allclose(np.asarray(y[1:5]),
                               np.exp(np.asarray(x[1:5])), rtol=1e-6)
