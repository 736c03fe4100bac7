import numpy as np
import jax
import jax.numpy as jnp

from nerf_texture_tpu.ops.hashgrid_packed import (PackedGridSpec,
                                                  packed_encode)


def make_spec(**kw):
    base = dict(input_dim=3, num_levels=4, level_dim=2, base_resolution=4,
                log2_bricks=7, per_level_scale=2.0)
    base.update(kw)
    return PackedGridSpec(**base)


def brick_oracle(x, table, spec):
    """Trilinear interpolation straight from the brick definition."""
    import math
    B = x.shape[0]
    out = np.zeros((B, spec.output_dim))
    tab = np.asarray(table, np.float64)
    for b in range(B):
        if np.any(x[b] < 0) or np.any(x[b] > 1):
            continue
        for lvl in range(spec.num_levels):
            scale = spec.level_scale(lvl)
            shift = 0.0 if spec.align_corners else 0.5
            pos = x[b] * scale + shift
            cell = np.floor(pos).astype(np.int64)
            f = pos - cell
            brick = cell >> 1
            local = cell & 1
            # brick id
            if spec.level_is_dense(lvl):
                side = spec.level_brick_side(lvl)
                idx = 0
                stride = 1
                for d in range(3):
                    idx += int(brick[d]) * stride
                    stride *= side
            else:
                primes = (1, 2654435761, 805459861)
                idx = 0
                for d in range(3):
                    idx ^= (int(brick[d]) * primes[d]) & 0xFFFFFFFF
                    idx &= 0xFFFFFFFF
            row = tab[idx % spec.level_bricks(lvl) + spec.offsets[lvl]]
            lat = row[:spec.row_width].reshape(27, spec.level_dim)
            acc = np.zeros(spec.level_dim)
            for corner in range(8):
                w = 1.0
                li = 0
                for d in range(3):
                    bit = (corner >> (2 - d)) & 1  # arbitrary order
                    o = int(local[d]) + bit
                    w *= f[d] if bit else (1.0 - f[d])
                    li = li * 3 + o
                acc += w * lat[li]
            out[b, lvl * spec.level_dim:(lvl + 1) * spec.level_dim] = acc
    return out


def test_forward_matches_brick_oracle():
    spec = make_spec()
    tab = spec.init(jax.random.PRNGKey(0), std=0.5)
    x = np.random.default_rng(1).uniform(0, 1, (32, 3)).astype(np.float32)
    out = np.asarray(packed_encode(jnp.asarray(x), tab, spec))
    ref = brick_oracle(x, tab, spec)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_fast_equals_slow_forward():
    spec = make_spec(num_levels=6, log2_bricks=9)
    tab = spec.init(jax.random.PRNGKey(2), std=0.5)
    x = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (64, 3)),
                    jnp.float32)
    a = packed_encode(x, tab, spec, fast=True)
    b = packed_encode(x, tab, spec, fast=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fast_backward_matches_autodiff():
    """The aggregated-scatter VJP must equal the plain autodiff grads."""
    spec = make_spec(num_levels=5, log2_bricks=6)
    tab = spec.init(jax.random.PRNGKey(4), std=0.5)
    x = jnp.asarray(np.random.default_rng(5).uniform(0, 1, (128, 3)),
                    jnp.float32)
    tgt = jnp.asarray(np.random.default_rng(6).normal(
        size=(128, spec.output_dim)), jnp.float32)

    def loss(t, fast):
        return jnp.sum((packed_encode(x, t, spec, fast=fast) - tgt) ** 2)

    g_fast = jax.grad(lambda t: loss(t, True))(tab)
    g_slow = jax.grad(lambda t: loss(t, False))(tab)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_slow),
                               atol=1e-4, rtol=1e-4)


def test_double_backward_fast_matches_slow():
    """grad-of-grad (the -grad(sigma) normal-supervision path) must work
    with the fast lookup/scatter pair and agree with plain autodiff."""
    spec = make_spec(num_levels=3, log2_bricks=6)
    tab = spec.init(jax.random.PRNGKey(10), std=0.5)
    x = jnp.asarray(np.random.default_rng(11).uniform(0.1, 0.9, (16, 3)),
                    jnp.float32)

    def normal_loss(t, fast):
        def sigma(pts):
            return jnp.sum(packed_encode(pts, t, spec, fast=fast) ** 2)

        n = jax.grad(sigma)(x)
        return jnp.sum(n ** 2)

    g_fast = jax.grad(lambda t: normal_loss(t, True))(tab)
    g_slow = jax.grad(lambda t: normal_loss(t, False))(tab)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_slow),
                               atol=1e-4, rtol=1e-3)


def test_input_gradients():
    spec = make_spec()
    tab = spec.init(jax.random.PRNGKey(7), std=0.5)

    def f(x):
        return jnp.sum(packed_encode(x, tab, spec) ** 2)

    x = jnp.asarray([[0.312, 0.571, 0.733]])
    g = jax.grad(f)(x)
    eps = 1e-4
    for d in range(3):
        fd = (f(x.at[0, d].add(eps)) - f(x.at[0, d].add(-eps))) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[0, d]), np.asarray(fd),
                                   rtol=2e-2, atol=1e-4)


def test_oob_zero_and_2d():
    spec = make_spec(input_dim=2, num_levels=3)
    tab = spec.init(jax.random.PRNGKey(8), std=0.5)
    x = jnp.asarray([[1.2, 0.5], [0.3, 0.4]])
    out = np.asarray(packed_encode(x, tab, spec))
    np.testing.assert_allclose(out[0], 0.0)
    assert np.abs(out[1]).max() > 0


def test_continuity_within_brick():
    """The field is C0 inside a brick (cell crossings that stay in one
    brick share the duplicated halo corners).  Note: crossings *between*
    bricks read independent parameter copies and are only approximately
    continuous -- the price of one-gather-per-level encoding; see
    hashgrid_packed.py module docstring."""
    spec = make_spec(num_levels=1, base_resolution=8)
    tab = spec.init(jax.random.PRNGKey(9), std=0.5)
    # level 0 scale = 7: cell boundary at pos = 1/7 (cell 0 -> 1, both in
    # brick 0)
    t = 1.0 / 7.0
    eps = 1e-5
    lo = packed_encode(jnp.asarray([[t - eps, 0.3, 0.3]]), tab, spec)
    hi = packed_encode(jnp.asarray([[t + eps, 0.3, 0.3]]), tab, spec)
    np.testing.assert_allclose(np.asarray(lo), np.asarray(hi), atol=1e-3)


def test_packed_encode_pair_matches_separate():
    """One-gather two-table encode == two separate encodes, values and
    gradients for both tables."""
    from nerf_texture_tpu.ops.hashgrid_packed import (
        PackedGridSpec, packed_encode, packed_encode_pair)

    spec = PackedGridSpec(input_dim=3, num_levels=4, level_dim=2,
                          base_resolution=8, desired_resolution=64,
                          log2_bricks=10)
    key = jax.random.PRNGKey(0)
    ka, kb, kx = jax.random.split(key, 3)
    ta = spec.init(ka, std=1e-1)
    tb = spec.init(kb, std=1e-1)
    x = jax.random.uniform(kx, (257, 3))

    oa = packed_encode(x, ta, spec)
    ob = packed_encode(x, tb, spec)
    pa, pb = packed_encode_pair(x, ta, tb, spec)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(oa), atol=1e-6)
    np.testing.assert_allclose(np.asarray(pb), np.asarray(ob), atol=1e-6)

    def loss_sep(ta, tb):
        return (jnp.sum(packed_encode(x, ta, spec) ** 2)
                + jnp.sum(jnp.sin(packed_encode(x, tb, spec))))

    def loss_pair(ta, tb):
        a, b = packed_encode_pair(x, ta, tb, spec)
        return jnp.sum(a ** 2) + jnp.sum(jnp.sin(b))

    ga, gb = jax.grad(loss_sep, argnums=(0, 1))(ta, tb)
    pa_g, pb_g = jax.grad(loss_pair, argnums=(0, 1))(ta, tb)
    np.testing.assert_allclose(np.asarray(pa_g), np.asarray(ga),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(pb_g), np.asarray(gb),
                               atol=1e-5)


def test_packed_encode_amp_close_to_f32():
    """bf16-gather AMP path: outputs close to f32, table grads f32 and
    close (f32 scatter accumulation is the point of _rows_lookup_amp)."""
    import jax
    import jax.numpy as jnp

    spec = PackedGridSpec(input_dim=3, num_levels=4, level_dim=2,
                          base_resolution=16, desired_resolution=64,
                          log2_bricks=10, align_corners=True)
    key = jax.random.PRNGKey(0)
    table = spec.init(key, std=1e-1)
    x = jax.random.uniform(jax.random.PRNGKey(1), (512, 3))

    out_f32 = packed_encode(x, table, spec)
    out_amp = packed_encode(x, table, spec, amp=True)
    assert out_amp.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out_amp), np.asarray(out_f32),
                               atol=2e-3, rtol=2e-2)

    def loss(t, amp):
        return jnp.sum(packed_encode(x, t, spec, amp=amp) ** 2)

    g_f32 = jax.grad(lambda t: loss(t, False))(table)
    g_amp = jax.grad(lambda t: loss(t, True))(table)
    assert g_amp.dtype == jnp.float32
    scale = float(jnp.abs(g_f32).max())
    np.testing.assert_allclose(np.asarray(g_amp) / scale,
                               np.asarray(g_f32) / scale, atol=3e-2)


def test_packed_encode_dual_matches_feature_only():
    """Dual table (features + log-variance in one row): group A equals a
    feature-only encode of the same table, group B equals an encode of
    the shifted lanes, gradients reach both groups (one scatter) and
    never the tile padding."""
    from nerf_texture_tpu.ops.hashgrid_packed import (
        PackedGridSpec, packed_encode, packed_encode_dual)

    spec = PackedGridSpec(input_dim=3, num_levels=4, level_dim=2,
                          base_resolution=8, desired_resolution=32,
                          log2_bricks=8)
    rw, dsw = spec.row_width, spec.dual_storage_width
    assert dsw == 128          # C=2: the dual row rides the tile padding
    tab = spec.init_dual(jax.random.PRNGKey(0), std_a=1e-2, std_b=1e-3)
    assert tab.shape == (spec.table_rows, dsw)
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))

    a, b = packed_encode_dual(x, tab, spec)
    np.testing.assert_allclose(np.asarray(a),
                               np.asarray(packed_encode(x, tab, spec)),
                               atol=1e-6)
    tab_b = jnp.concatenate(
        [tab[:, rw:2 * rw],
         jnp.zeros((tab.shape[0], tab.shape[1] - rw))], -1)
    np.testing.assert_allclose(np.asarray(b),
                               np.asarray(packed_encode(x, tab_b, spec)),
                               atol=1e-6)

    def loss(t):
        a, b = packed_encode_dual(x, t, spec)
        return jnp.sum(a ** 2) + jnp.sum(jnp.exp(b))

    g = np.asarray(jax.grad(loss)(tab))
    assert np.abs(g[:, :rw]).max() > 0
    assert np.abs(g[:, rw:2 * rw]).max() > 0
    assert np.abs(g[:, 2 * rw:]).max() == 0
