"""Rotation utilities (pytorch3d / scipy replacements).

Used for trainable camera deltas (axis_angle_to_matrix,
nerf/provider.py:383) and GUI light rotation (scipy Rotation.from_rotvec,
nerf/network_curvedfield.py:305).
"""

from __future__ import annotations

import jax.numpy as jnp


def axis_angle_to_matrix(rotvec):
    """Rodrigues formula: [..., 3] axis-angle -> [..., 3, 3] rotation.

    Differentiable at rotvec = 0 (trainable camera deltas start there):
    theta uses sqrt(|v|^2 + eps) and the sin/cos factors are folded so no
    0/0 appears in the backward pass."""
    theta = jnp.sqrt(jnp.sum(rotvec * rotvec, axis=-1,
                             keepdims=True) + 1e-16)
    axis = rotvec / theta
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)
    t = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    return eye + jnp.sin(t) * K + (1.0 - jnp.cos(t)) * (K @ K)


def euler_to_matrix(euler):
    """XYZ-intrinsic Euler angles [3] -> [3, 3] (matches
    scipy Rotation.from_rotvec usage for small GUI rotations when given a
    rotation vector -- we use axis-angle for exactness)."""
    return axis_angle_to_matrix(jnp.asarray(euler))
