"""Activation functions.

TPU-native equivalent of the reference's ``tools/activation.py`` (trunc_exp:
an exp with a clamped backward to avoid fp16 overflow).
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    """exp(x) whose backward clamps the saved input to [-15, 15].

    Mirrors the reference ``tools/activation.py`` `_trunc_exp`: forward is a
    plain exp; backward returns ``g * exp(clamp(x, -15, 15))`` so that large
    densities do not produce inf gradients under low precision.
    """
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def biased_softplus(x, bias: float = 0.0):
    """Softplus with a shift, an alternative density activation."""
    return jax.nn.softplus(x + bias)
