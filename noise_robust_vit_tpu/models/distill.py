"""DeiT-style distillation-token wrapper (ref distill.py).

``DistillableViT`` runs the ViT with an extra distillation token appended
after the posemb'd sequence (ref distill.py:20-47); ``DistillWrapper`` owns
the token + its LN-Linear head and computes
``(1-α)·CE(student, labels) + α·distill`` where distill is temperature-scaled
KL vs the frozen teacher (soft) or CE vs the teacher's argmax (hard)
(ref distill.py:107-155).

The teacher is any apply-able (params, images) → logits callable; the
reference's ``isinstance`` gate on student classes maps to the structural
requirement that the student accepts ``distill_token=...``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from .vit import ViT

__all__ = ["DistillableViT", "DistillWrapper"]


class DistillableViT(ViT):
    """ViT accepting an optional distill token (ref distill.py:20-66)."""

    def __call__(self, img, *, distill_token=None, deterministic: bool = True,
                 return_features: bool = False):
        if distill_token is None:
            return super().__call__(
                img, deterministic=deterministic, return_features=return_features
            )
        x = self.patchify_tokens(img)
        b, n, _ = x.shape
        cls = jnp.broadcast_to(self.cls_token.astype(x.dtype), (b, 1, self.dim))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embedding[:, : n + 1].astype(x.dtype)
        dt = jnp.broadcast_to(distill_token.astype(x.dtype), (b, 1, self.dim))
        x = jnp.concatenate([x, dt], axis=1)
        x = self.emb_drop(x, deterministic=deterministic)
        x = self.forward_tokens(x, deterministic=deterministic)
        x, distill_tokens = x[:, :-1], x[:, -1]
        x = jnp.mean(x, axis=1) if self.pool == "mean" else x[:, 0]
        return self.mlp_head(x), distill_tokens


class DistillWrapper(nn.Module):
    """(ref distill.py:107-155.) ``teacher_apply(images) -> logits`` must be
    a closure over frozen teacher params (stop-gradiented here anyway)."""

    student: DistillableViT
    teacher_apply: Callable
    temperature: float = 1.0
    alpha: float = 0.5
    hard: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, labels, *, temperature=None, alpha=None,
                 deterministic: bool = True):
        a = self.alpha if alpha is None else alpha
        t = self.temperature if temperature is None else temperature

        teacher_logits = jax.lax.stop_gradient(self.teacher_apply(img))

        token = self.param(
            "distillation_token", nn.initializers.normal(1.0),
            (1, 1, self.student.dim),
        )
        student_logits, distill_tokens = self.student(
            img, distill_token=token, deterministic=deterministic
        )
        d = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="distill_norm")(distill_tokens)
        distill_logits = nn.Dense(
            self.student.num_classes, dtype=self.dtype, name="distill_head"
        )(d)

        loss = optax.softmax_cross_entropy_with_integer_labels(
            student_logits.astype(jnp.float32), labels
        ).mean()

        if not self.hard:
            log_p = jax.nn.log_softmax(distill_logits.astype(jnp.float32) / t, -1)
            q = jax.nn.softmax(teacher_logits.astype(jnp.float32) / t, -1)
            log_q = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / t, -1)
            distill_loss = jnp.sum(q * (log_q - log_p)) / img.shape[0]
            distill_loss = distill_loss * t**2
        else:
            distill_loss = optax.softmax_cross_entropy_with_integer_labels(
                distill_logits.astype(jnp.float32),
                jnp.argmax(teacher_logits, axis=-1),
            ).mean()

        return loss * (1 - a) + distill_loss * a
