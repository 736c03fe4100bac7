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
    # exact VJP of the clamped forward: zero beyond the saturation point.
    # The reference returns g*exp(clamp(x, 15)) even for x > 15 (its
    # forward is unclamped); with a clamped forward that phantom
    # gradient is ~e^15 x larger than every other gradient in the batch
    # and steamrolls the shared hash rows + MLP (measured: loss 5e-4 ->
    # 0.27 within ~30 steps of the first saturated cell).  Saturated
    # cells freeze instead; in-range cells keep exact exp gradients.
    grad = jnp.where(jnp.abs(x) < 15.0,
                     jnp.exp(jnp.clip(x, -15.0, 15.0)), 0.0)
    return (g * grad,)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def biased_softplus(x, bias: float = 0.0):
    """Softplus with a shift, an alternative density activation."""
    return jax.nn.softplus(x + bias)
