"""Activation functions.

TPU-native equivalent of the reference's ``tools/activation.py`` (trunc_exp:
an exp with a clamped backward to avoid fp16 overflow).
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    """exp(clamp(x, -15, 15)): the truncated density activation.

    The reference ``tools/activation.py`` `_trunc_exp` clamps only the
    backward, but its forward runs under fp16 autocast which SATURATES
    at 65504 -- an implicit cap.  In f32 an uncapped exp lets density
    run away unboundedly on interior cells (measured: pre-activation
    +0.02/step once alpha saturates, sigma 4e6 by step 1755, inf -> NaN
    cascade at 1770 on the 400^2 sphere run).  Clamping the forward at
    exp(15)=3.3e6 -- 50x the reference's effective fp16 ceiling, far
    beyond any visually meaningful density (alpha=1 at sigma*dt>10) --
    is the f32-native equivalent.  Backward keeps the same clamp, so
    fwd/bwd are consistent and saturated cells stop accumulating.
    """
    return jnp.exp(jnp.clip(x, -15.0, 15.0))


def _trunc_exp_fwd(x):
    return jnp.exp(jnp.clip(x, -15.0, 15.0)), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def biased_softplus(x, bias: float = 0.0):
    """Softplus with a shift, an alternative density activation."""
    return jax.nn.softplus(x + bias)
