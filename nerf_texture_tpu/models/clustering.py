"""Feature-clustering regularizer for texture-patch reuse.

Rebuild of the reference ``ClusteringLayer`` / ``GridEncoder_clustering``
(gridencoder/grid_clustering.py:95-217): per-level learnable cluster
centers with a Student-t soft assignment and a KL self-distillation loss
that sharpens hash features toward discrete clusters (making them
re-usable as texture patches)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def init_cluster_centers(key, num_levels: int, n_clusters: int = 4,
                         hidden: int = 2, std: float = 1e-4):
    return jax.random.uniform(key, (num_levels, n_clusters, hidden),
                              minval=-std, maxval=std)


def soft_assignment(x, centers, alpha: float = 1.0):
    """Student-t kernel soft assignment (grid_clustering.py:106-117)."""
    d2 = jnp.sum((x[:, None, :] - centers[None]) ** 2, axis=-1)
    num = (1.0 / (1.0 + d2 / alpha)) ** ((alpha + 1.0) / 2.0)
    return num / jnp.sum(num, axis=1, keepdims=True)


def clustering_loss_level(embeddings, centers, alpha: float = 1.0):
    """KL(target || t) with the sharpened self-distillation target
    (grid_clustering.py:119-123).  Matches torch KLDivLoss(reduction=
    'mean'): mean over all elements of target * (log target - log t)."""
    t = soft_assignment(embeddings, centers, alpha)
    target = (t ** 2) / jnp.sum(t, axis=0, keepdims=True)
    target = target / jnp.sum(target, axis=1, keepdims=True)
    target = jax.lax.stop_gradient(target)
    kl = target * (jnp.log(jnp.clip(target, 1e-12, None))
                   - jnp.log(jnp.clip(t, 1e-12, None)))
    return jnp.mean(kl)


def clustering_loss(table, level_slices, centers, key=None,
                    alpha: float = 1.0, level_dim: int = 2,
                    row_width: int | None = None):
    """Sum of per-level clustering losses over the (packed) hash table.

    Args:
      table: [rows, row_width] packed table; each row holds
        row_width / level_dim lattice entries of `level_dim` channels.
      level_slices: list of (start, end) row ranges per level (static).
      centers: [L, n_clusters, level_dim].
      key: if given, pick one random level like the reference
        (grid_clustering.py:201-204); else sum all levels.
    """
    width = row_width if row_width is not None else table.shape[1]

    def level_loss(lvl):
        start, end = level_slices[lvl]
        # rows may be lane-padded (PackedGridSpec.storage_width); only
        # the first `row_width` entries are live features
        emb = table[start:end, :width].reshape(-1, level_dim)
        return clustering_loss_level(emb, centers[lvl], alpha)

    if key is not None:
        # lax.switch so ONLY the picked level's sweep executes -- a
        # traced losses[pick] would still compute every level's pass
        # over the full table (measured ~53 ms/step of the curved
        # train step; the reference sweeps one level, pick_level=True,
        # grid_clustering.py:199-204)
        pick = jax.random.randint(key, (), 0, len(level_slices))
        return jax.lax.switch(
            pick, [partial(level_loss, lvl)
                   for lvl in range(len(level_slices))])
    return sum(level_loss(lvl) for lvl in range(len(level_slices)))
