"""Spherical k-means on device — TPU-native replacement for the faiss-GPU
clustering of ref examples/build_grouping.py:38-52.

Lloyd iterations expressed as one jitted ``lax.scan``: assignment is an
argmax over a [N, K] similarity GEMM (MXU), the centroid update is a
segment-sum via one-hot matmul (also MXU), then L2 renormalization
(spherical). Empty clusters keep their previous centroid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["kmeans", "kmeans_assign"]


def _normalize(x, eps=1e-12):
    return x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), eps, None)


@functools.partial(jax.jit, static_argnames=("k", "niter", "spherical"))
def kmeans(
    key: jax.Array,
    x: jax.Array,
    k: int,
    niter: int = 20,
    spherical: bool = True,
):
    """Cluster ``x`` [N, D] into ``k`` groups. Returns (centroids [K, D],
    assignments [N])."""
    n = x.shape[0]
    if spherical:
        x = _normalize(x)
    init_idx = jax.random.choice(key, n, (k,), replace=False)
    centroids = x[init_idx]

    def step(centroids, _):
        sim = jnp.einsum(
            "nd,kd->nk", x, centroids, preferred_element_type=jnp.float32
        )
        if not spherical:
            sim = -(
                jnp.sum(x**2, -1, keepdims=True)
                - 2 * sim
                + jnp.sum(centroids**2, -1)[None]
            )
        assign = jnp.argmax(sim, axis=-1)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)  # [N, K]
        sums = jnp.einsum("nk,nd->kd", onehot, x)
        counts = jnp.sum(onehot, axis=0)[:, None]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1), centroids)
        if spherical:
            new = _normalize(new)
        return new, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=niter)
    final_sim = jnp.einsum(
        "nd,kd->nk", x, centroids, preferred_element_type=jnp.float32
    )
    return centroids, jnp.argmax(final_sim, axis=-1)


@jax.jit
def kmeans_assign(x: jax.Array, centroids: jax.Array) -> jax.Array:
    """Nearest-centroid assignment by cosine similarity."""
    sim = jnp.einsum(
        "nd,kd->nk", _normalize(x), _normalize(centroids),
        preferred_element_type=jnp.float32,
    )
    return jnp.argmax(sim, axis=-1)
