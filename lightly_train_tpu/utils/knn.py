"""kNN classifier evaluation on embeddings.

The BASELINE.json accuracy metric (DINOv2 val kNN acc, ``README.md:506-514``
reports 81.9% for dinov2/vitl16) is a weighted cosine kNN over frozen
embeddings — this is the standard DINO eval protocol. Runs fully on device:
the (Nq, Nt) similarity matmul rides the MXU; scores are temperature-weighted
top-k votes.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "num_classes"))
def knn_predict(
    query: jax.Array,  # (Nq, D)
    train_features: jax.Array,  # (Nt, D)
    train_labels: jax.Array,  # (Nt,)
    num_classes: int,
    k: int = 20,
    temperature: float = 0.07,
) -> jax.Array:
    """Weighted-kNN class predictions (DINO eval protocol)."""
    q = query / jnp.maximum(jnp.linalg.norm(query, axis=1, keepdims=True), 1e-8)
    t = train_features / jnp.maximum(
        jnp.linalg.norm(train_features, axis=1, keepdims=True), 1e-8
    )
    sim = q @ t.T  # (Nq, Nt)
    k = min(k, t.shape[0])
    top_sim, top_idx = jax.lax.top_k(sim, k)
    weights = jnp.exp(top_sim / temperature)  # (Nq, k)
    votes = jax.nn.one_hot(train_labels[top_idx], num_classes)  # (Nq, k, C)
    scores = jnp.sum(weights[..., None] * votes, axis=1)
    return jnp.argmax(scores, axis=-1)


def knn_accuracy(
    query: jax.Array,
    query_labels: jax.Array,
    train_features: jax.Array,
    train_labels: jax.Array,
    num_classes: int,
    k: int = 20,
    temperature: float = 0.07,
    chunk_size: int = 4096,
) -> float:
    """Chunks queries so the (Nq, Nt) similarity matrix never materializes
    whole (ImageNet val x train would be ~256 GB); each chunk's matmul
    still rides the MXU. The last chunk pads to the chunk shape so only
    two programs compile."""
    nq = int(query.shape[0])
    correct = 0
    for start in range(0, nq, chunk_size):
        q = query[start : start + chunk_size]
        n = int(q.shape[0])
        if n < chunk_size and start > 0:
            q = jnp.pad(q, ((0, chunk_size - n), (0, 0)))
        pred = knn_predict(
            q, train_features, train_labels, num_classes, k, temperature
        )[:n]
        correct += int(
            jnp.sum(
                (pred == query_labels[start : start + n]).astype(jnp.int32)
            )
        )
    return correct / max(nq, 1)
