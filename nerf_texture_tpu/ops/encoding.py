"""Coordinate encodings: frequency (positional) and real spherical harmonics.

TPU-native equivalents of the reference's ``tools/encoding.py`` (FreqEncoder)
and ``shencoder/src/shencoder.cu`` (hard-coded SH polynomials, degrees 1-8).

Both are pure-JAX closed-form polynomial evaluation -- fully fused by XLA
into surrounding matmuls, so no custom kernel is needed (the VPU handles
these at memory speed).
"""

import math

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Frequency encoding
# ---------------------------------------------------------------------------

def freq_encode(x, n_freqs: int, max_freq_log2: float | None = None,
                include_input: bool = True, log_sampling: bool = True):
    """NeRF-style frequency encoding.

    Matches reference ``tools/encoding.py:5-43`` (FreqEncoder): bands are
    ``2**linspace(0, max_freq_log2, n_freqs)`` and the output is
    ``[x, sin(f0 x), cos(f0 x), sin(f1 x), cos(f1 x), ...]`` concatenated on
    the last axis.

    Args:
      x: [..., D] input.
      n_freqs: number of frequency bands.
      max_freq_log2: log2 of the max frequency; defaults to ``n_freqs - 1``.
      include_input: prepend the raw input.
      log_sampling: log-spaced (True) or linearly spaced bands.

    Returns:
      [..., D * (include_input + 2 * n_freqs)]
    """
    import numpy as np

    if max_freq_log2 is None:
        max_freq_log2 = n_freqs - 1
    if log_sampling:
        bands = [2.0 ** f for f in
                 (np.linspace(0.0, max_freq_log2, n_freqs).tolist()
                  if n_freqs > 1 else [0.0])]
    else:
        bands = np.linspace(2.0 ** 0.0, 2.0 ** max_freq_log2,
                            n_freqs).tolist()
    out = [x] if include_input else []
    for f in bands:
        xf = x * f
        out.append(jnp.sin(xf))
        out.append(jnp.cos(xf))
    return jnp.concatenate(out, axis=-1)


def freq_encode_dim(input_dim: int, n_freqs: int,
                    include_input: bool = True) -> int:
    return input_dim * ((1 if include_input else 0) + 2 * n_freqs)


# ---------------------------------------------------------------------------
# Real spherical harmonics
# ---------------------------------------------------------------------------

def _double_factorial(n: int) -> float:
    out = 1.0
    while n > 1:
        out *= n
        n -= 2
    return out


def _sh_basis_coeffs(degree: int):
    """Precompute the K_lm normalisation constants with Condon-Shortley phase.

    Real SH convention matching the reference's hard-coded polynomials
    (``shencoder/src/shencoder.cu:28+``): output index ``l*l + l + m``,
    negative m are the sin(m phi) terms, and the associated Legendre
    functions carry the (-1)^m Condon-Shortley phase.
    """
    coeffs = {}
    for l in range(degree):
        for m in range(l + 1):
            k = math.sqrt((2 * l + 1) / (4.0 * math.pi)
                          * math.factorial(l - m) / math.factorial(l + m))
            if m > 0:
                k *= math.sqrt(2.0)
            coeffs[(l, m)] = k
    return coeffs


def sh_encode(dirs, degree: int = 4):
    """Evaluate the real spherical-harmonics basis at unit directions.

    Closed-form evaluation via the standard associated-Legendre recurrences,
    unrolled at trace time (degree is static).  Equivalent to the hard-coded
    polynomials in ``shencoder/src/shencoder.cu`` for degrees 1..8.

    Args:
      dirs: [..., 3] unit direction vectors (x, y, z).
      degree: SH degree (number of bands), 1..8; output has degree**2
        channels ordered ``l*l + l + m`` for l in [0, degree), m in [-l, l].

    Returns:
      [..., degree**2] basis values.
    """
    if not 1 <= degree <= 8:
        raise ValueError(f"sh degree must be in [1, 8], got {degree}")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    K = _sh_basis_coeffs(degree)

    # c_m = Re((x + i y)^m), s_m = Im((x + i y)^m): sin^m(theta) folded into
    # the azimuthal factors so everything is polynomial in (x, y, z).
    c = [jnp.ones_like(x)]
    s = [jnp.zeros_like(x)]
    for m in range(1, degree):
        c.append(x * c[m - 1] - y * s[m - 1])
        s.append(x * s[m - 1] + y * c[m - 1])

    # pbar[l][m] = P_l^m / sin^m(theta): polynomials in z only.
    # Recurrences: pbar_m^m = (-1)^m (2m-1)!!,
    #              pbar_{m+1}^m = z (2m+1) pbar_m^m,
    #              (l-m) pbar_l^m = (2l-1) z pbar_{l-1}^m
    #                               - (l+m-1) pbar_{l-2}^m.
    pbar = [[None] * degree for _ in range(degree)]
    for m in range(degree):
        pmm = ((-1.0) ** m) * _double_factorial(2 * m - 1)
        pbar[m][m] = pmm * jnp.ones_like(z)
        if m + 1 < degree:
            pbar[m + 1][m] = (2 * m + 1) * pmm * z
        for l in range(m + 2, degree):
            pbar[l][m] = ((2 * l - 1) * z * pbar[l - 1][m]
                          - (l + m - 1) * pbar[l - 2][m]) / (l - m)

    out = [None] * (degree * degree)
    for l in range(degree):
        out[l * l + l] = K[(l, 0)] * pbar[l][0]
        for m in range(1, l + 1):
            base = K[(l, m)] * pbar[l][m]
            out[l * l + l + m] = base * c[m]
            out[l * l + l - m] = base * s[m]
    return jnp.stack(out, axis=-1)


def sh_encode_dim(degree: int) -> int:
    return degree * degree
