import numpy as np
import jax.numpy as jnp
from scipy.special import sph_harm_y

from nerf_texture_tpu.ops import (freq_encode, freq_encode_dim, sh_encode,
                                  sh_encode_dim)


def random_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)


def test_sh_matches_scipy_all_degrees():
    """Our real SH == sqrt(2)*Re/Im of scipy's complex SH (which carries the
    same Condon-Shortley phase as the reference's polynomials)."""
    dirs = random_dirs(64)
    x, y, z = dirs.T
    theta = np.arccos(np.clip(z, -1, 1))
    phi = np.arctan2(y, x)
    for degree in [1, 2, 3, 4, 5, 8]:
        out = np.asarray(sh_encode(jnp.asarray(dirs), degree))
        assert out.shape == (64, sh_encode_dim(degree))
        for l in range(degree):
            for m in range(0, l + 1):
                ref = sph_harm_y(l, m, theta, phi)
                if m == 0:
                    np.testing.assert_allclose(
                        out[:, l * l + l], ref.real, atol=2e-5)
                else:
                    np.testing.assert_allclose(
                        out[:, l * l + l + m], np.sqrt(2) * ref.real,
                        atol=3e-4)
                    np.testing.assert_allclose(
                        out[:, l * l + l - m], np.sqrt(2) * ref.imag,
                        atol=3e-4)


def test_sh_degree4_explicit_constants():
    """Spot-check against the standard instant-ngp polynomial constants."""
    dirs = random_dirs(16, seed=1)
    x, y, z = dirs.T
    out = np.asarray(sh_encode(jnp.asarray(dirs), 4))
    np.testing.assert_allclose(out[:, 0], 0.28209479177387814, atol=1e-6)
    np.testing.assert_allclose(out[:, 1], -0.48860251190291987 * y, atol=1e-5)
    np.testing.assert_allclose(out[:, 2], 0.48860251190291987 * z, atol=1e-5)
    np.testing.assert_allclose(out[:, 3], -0.48860251190291987 * x, atol=1e-5)
    np.testing.assert_allclose(out[:, 4], 1.0925484305920792 * x * y,
                               atol=1e-5)
    np.testing.assert_allclose(out[:, 6],
                               0.94617469575755997 * z * z
                               - 0.31539156525251999, atol=1e-5)
    np.testing.assert_allclose(out[:, 8],
                               0.54627421529603959 * (x * x - y * y),
                               atol=1e-5)
    np.testing.assert_allclose(out[:, 12],
                               0.3731763325901154 * z * (5 * z * z - 3),
                               atol=1e-5)


def test_freq_encode():
    x = np.random.default_rng(0).normal(size=(8, 3)).astype(np.float32)
    n_freqs = 6
    out = np.asarray(freq_encode(jnp.asarray(x), n_freqs))
    assert out.shape == (8, freq_encode_dim(3, n_freqs))
    np.testing.assert_allclose(out[:, :3], x, atol=1e-6)
    bands = 2.0 ** np.linspace(0, n_freqs - 1, n_freqs)
    expected = [x]
    for f in bands:
        expected.append(np.sin(x * f))
        expected.append(np.cos(x * f))
    np.testing.assert_allclose(out, np.concatenate(expected, -1), atol=1e-5)
