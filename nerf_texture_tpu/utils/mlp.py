"""Tiny MLP utilities.

The reference needs fused-MLP CUDA machinery (``ffmlp/src/ffmlp.cu``:
register-resident weights, wmma tiles, split-K backward) because small
GEMMs underutilize a GPU.  On TPU the MXU eats batched [N, 64] x [64, 64]
matmuls directly, and XLA fuses the activations, so the entire ffmlp/tcnn
layer collapses to ``jnp.dot`` chains in bf16 with f32 params.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_mlp(key, dims, bias: bool = False, dtype=jnp.float32):
    """He-initialised MLP params: dims = [in, h1, ..., out].

    Matches the reference nets' ``nn.Linear(..., bias=False)`` structure
    (nerf/network.py:45,66).  Returns a list of {"w": [in, out]} (+ "b").
    """
    layers = []
    for i in range(len(dims) - 1):
        key, k = jax.random.split(key)
        fan_in = dims[i]
        w = jax.random.normal(k, (dims[i], dims[i + 1]), dtype) \
            * jnp.sqrt(2.0 / fan_in)
        layer = {"w": w}
        if bias:
            layer["b"] = jnp.zeros((dims[i + 1],), dtype)
        layers.append(layer)
    return layers


def apply_mlp(layers, x, *, activation=jax.nn.relu, final_activation=None,
              compute_dtype=jnp.bfloat16, out_dtype=jnp.float32):
    """Apply an MLP; matmuls run in ``compute_dtype`` (bf16 -> MXU), the
    result is cast to ``out_dtype``."""
    h = x.astype(compute_dtype)
    n = len(layers)
    for i, layer in enumerate(layers):
        # bf16 operands on the MXU, f32 accumulation
        h = jnp.dot(h, layer["w"].astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        if "b" in layer:
            h = h + layer["b"]
        if i < n - 1:
            h = activation(h).astype(compute_dtype)
    h = h.astype(out_dtype)
    if final_activation is not None:
        h = final_activation(h)
    return h
