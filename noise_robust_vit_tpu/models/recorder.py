"""Recorder / Extractor — introspection without hooks (ref recorder.py,
extractor.py).

The reference registers forward hooks on every ``Attention.attend`` to
collect per-layer attention maps (ref recorder.py:12-61) or on a named layer
to collect embeddings (ref extractor.py:18-90). In JAX, intermediates are
sown into a flax collection instead: under ``models.layers.recording()``
every shared-``Attention`` module stores its (post-Sinkhorn, pre-dropout)
attention weights, and ``Transformer`` stores per-block outputs; apply with
``mutable=['intermediates']`` and these helpers tidy the result.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import recording

__all__ = ["Recorder", "Extractor"]


def _collect(tree, leaf_name: str):
    out = []
    for path, value in jax.tree_util.tree_leaves_with_path(tree):
        if leaf_name in jax.tree_util.keystr(path):
            out.append(value)
    return out


class Recorder:
    """``Recorder(model)(variables, img) -> (preds, attns)`` with ``attns``
    stacked [B, depth, heads, N, N] (ref recorder.py:12-61)."""

    def __init__(self, vit):
        self.vit = vit

    def __call__(self, variables, img, **kwargs):
        with recording():
            preds, state = self.vit.apply(
                variables, img, mutable=["intermediates"], **kwargs
            )
        attns = _collect(state["intermediates"], "attn")
        attns = jnp.stack(attns, axis=1) if attns else None
        return preds, attns


class Extractor:
    """``Extractor(model)(variables, img) -> (preds, embeddings)`` where
    embeddings are the final per-block token outputs
    (ref extractor.py:18-90; ``layer_name`` selects which block, default
    the last)."""

    def __init__(self, vit, layer: int = -1, return_embeddings_only: bool = False):
        self.vit = vit
        self.layer = layer
        self.return_embeddings_only = return_embeddings_only

    def __call__(self, variables, img, **kwargs):
        with recording():
            preds, state = self.vit.apply(
                variables, img, mutable=["intermediates"], **kwargs
            )
        blocks = _collect(state["intermediates"], "block_out")
        emb = blocks[self.layer] if blocks else None
        if self.return_embeddings_only:
            return emb
        return preds, emb
