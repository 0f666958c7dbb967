"""ATS-ViT — Adaptive Token Sampling (ref ats_vit.py).

Per layer, the CLS row of the attention matrix (weighted by value norms)
defines a sampling distribution over tokens; ``output_num_tokens`` tokens are
drawn by Gumbel-max over the log-probabilities, duplicates removed, and both
the attention rows and the residual stream are gathered down to the sampled
set (ref ats_vit.py:42-110, :154-181).

TPU adaptation (SURVEY.md §7.3 "keep masks static-shaped"): the reference's
``torch.unique`` + ``pad_sequence`` produce DYNAMIC shapes; here the k
sampled ids are kept at static length and duplicates are masked out instead
of removed — the same tokens participate, identical semantics, static shape.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import gelu

from ..utils import pair

__all__ = ["ATSViT"]


def _ats_sample(key, attn, v, mask, output_num_tokens, eps=1e-6):
    """(ref ats_vit.py:48-110.) Returns (new_attn, new_mask, token_ids)."""
    b = attn.shape[0]
    cls_attn = attn[..., 0, 1:]  # [B, H, N-1]
    value_norms = jnp.linalg.norm(v[..., 1:, :], axis=-1)  # [B, H, N-1]
    scores = jnp.einsum("bhn,bhn->bn", cls_attn, value_norms)
    normed = scores / (jnp.sum(scores, axis=-1, keepdims=True) + eps)
    pseudo_logits = jnp.log(normed + eps)
    mask_value = jnp.finfo(jnp.float32).min / 2
    pseudo_logits = jnp.where(mask[:, 1:], pseudo_logits, mask_value)

    k = output_num_tokens
    gumbel = jax.random.gumbel(key, (b, k, pseudo_logits.shape[-1]))
    sampled = jnp.argmax(pseudo_logits[:, None, :] + gumbel, axis=-1) + 1  # [B, k]

    # static-shape "unique": sort and mask duplicates
    sampled = jnp.sort(sampled, axis=-1)
    dup = jnp.concatenate(
        [jnp.zeros((b, 1), bool), sampled[:, 1:] == sampled[:, :-1]], axis=-1
    )
    new_mask = ~dup
    # CLS prepended: id 0, always valid
    token_ids = jnp.concatenate([jnp.zeros((b, 1), sampled.dtype), sampled], axis=-1)
    new_mask = jnp.concatenate([jnp.ones((b, 1), bool), new_mask], axis=-1)

    new_attn = jnp.take_along_axis(
        attn, token_ids[:, None, :, None], axis=2
    )
    return new_attn, new_mask, token_ids


class ATSViT(nn.Module):
    """(ref ats_vit.py:220-265 — the file's ``ViT``.)"""

    image_size: Any
    patch_size: Any
    num_classes: int
    dim: int
    depth: int
    max_tokens_per_depth: Sequence[int]
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, *, deterministic: bool = True,
                 return_sampled_token_ids: bool = False):
        if len(self.max_tokens_per_depth) != self.depth:
            raise ValueError("max_tokens_per_depth must have length == depth")
        b, h, w, c = img.shape
        ph, pw = pair(self.patch_size)
        x = img.reshape(b, h // ph, ph, w // pw, pw, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, ph * pw * c)
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_proj")(x)
        n = x.shape[1]
        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, n + 1, self.dim)
        )
        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.dim)), x], axis=1
        )
        x = x + pos[:, : n + 1].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)

        mask = jnp.ones((b, x.shape[1]), bool)
        token_ids = jnp.broadcast_to(jnp.arange(x.shape[1])[None], (b, x.shape[1]))
        inner = self.heads * self.dim_head
        for i, out_tokens in enumerate(self.max_tokens_per_depth):
            num_tokens = x.shape[1]
            xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm_attn_{i}")(x)
            qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                           name=f"to_qkv_{i}")(xn)
            q, k, v = (
                t.reshape(b, num_tokens, self.heads, self.dim_head).transpose(0, 2, 1, 3)
                for t in jnp.split(qkv, 3, axis=-1)
            )
            dots = jnp.einsum(
                "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
            ) * (self.dim_head**-0.5)
            pair_mask = mask[:, None, :, None] & mask[:, None, None, :]
            dots = jnp.where(pair_mask, dots, jnp.finfo(jnp.float32).min)
            attn = jax.nn.softmax(dots, axis=-1)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)

            if num_tokens - 1 > out_tokens:
                key = (
                    self.make_rng("ats")
                    if not deterministic
                    else jax.random.PRNGKey(i)
                )
                attn, mask, sampled = _ats_sample(key, attn, v, mask, out_tokens)
                x = jnp.take_along_axis(x, sampled[..., None], axis=1)
                token_ids = jnp.take_along_axis(token_ids, sampled, axis=1)

            out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
            out = out.transpose(0, 2, 1, 3).reshape(b, -1, inner)
            out = nn.Dense(self.dim, dtype=self.dtype, name=f"to_out_{i}")(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
            x = x + out
            xf = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm_ff_{i}")(x)
            f = nn.Dense(self.mlp_dim, dtype=self.dtype, name=f"ff_{i}_fc1")(xf)
            f = gelu(f)
            f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
            f = nn.Dense(self.dim, dtype=self.dtype, name=f"ff_{i}_fc2")(f)
            f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
            x = x + f

        logits = nn.Dense(
            self.num_classes, dtype=self.dtype, name="head"
        )(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="head_norm")(x[:, 0]))
        if return_sampled_token_ids:
            return logits, token_ids[:, 1:] - 1
        return logits
