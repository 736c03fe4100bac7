"""nerf_texture_tpu: a TPU-native JAX/Pallas rebuild of NeRF-Texture.

A from-scratch framework with the capabilities of yihua7/NeRF-Texture
(SIGGRAPH 2023 + TPAMI 2024), re-designed for TPU hardware:

- ``ops``       -- compute kernels: multiresolution hash grid, spherical
                   harmonics, frequency encoding, occupancy-grid ray march,
                   volume compositing.  All pure XLA / Pallas, no atomics,
                   no dynamic shapes, no host round-trips under ``jit``.
- ``geometry``  -- grid-hash geometry engine: k-NN, ray casting, signed
                   distance, barycentric projection (replaces the
                   reference's FRNN / cubvh / RayTracer CUDA libraries).
- ``models``    -- Instant-NGP NeRF, MeshFeatureField surface field,
                   curved-field NeRF-Texture model, SH/SG/envmap light
                   models.
- ``render``    -- rendering orchestration (train + inference paths).
- ``data``      -- transforms.json dataset provider with device-side ray
                   generation.
- ``train``     -- Trainer: optax/orbax training loop with EMA, PSNR eval,
                   checkpointing.
- ``synthesis`` -- patch sampling, flat quilting synthesis, curved-surface
                   synthesis (the texture pipeline).
- ``parallel``  -- jax.sharding mesh utilities: ray-batch data parallelism
                   with replicated parameters.
"""

__version__ = "0.1.0"
