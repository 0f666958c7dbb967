"""RvT — Rotary Vision Transformer (ref rvt.py).

ViT with 2D axial rotary position embeddings applied to queries/keys (CLS
excluded; handles rotary dim < head dim by passing the remainder through,
ref rvt.py:15-44, :131-152), optional depthwise-conv query projection
(``SpatialConv``, ref :67-82) and GEGLU feedforward (ref :84-97). No
absolute positional embedding."""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import robust_softmax, gelu
from ..utils import pair

__all__ = ["RvT"]


def _axial_rotary(dim: int, n_side: int, max_freq: float = 10.0):
    """(ref rvt.py:19-44.) Returns (sin, cos) of shape [n_side², dim]."""
    scales = np.linspace(1.0, max_freq / 2, dim // 4)
    seq = np.linspace(-1.0, 1.0, n_side)[:, None] * scales[None, :] * np.pi
    x_sinu = np.broadcast_to(seq[:, None, :], (n_side, n_side, dim // 4))
    y_sinu = np.broadcast_to(seq[None, :, :], (n_side, n_side, dim // 4))
    sin = np.concatenate([np.sin(x_sinu), np.sin(y_sinu)], axis=-1)
    cos = np.concatenate([np.cos(x_sinu), np.cos(y_sinu)], axis=-1)
    sin = sin.reshape(n_side * n_side, -1).repeat(2, axis=-1)
    cos = cos.reshape(n_side * n_side, -1).repeat(2, axis=-1)
    return jnp.asarray(sin, jnp.float32), jnp.asarray(cos, jnp.float32)


def _rotate_every_two(x):
    x1, x2 = x[..., 0::2], x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


class RvT(nn.Module):
    """(ref rvt.py:178-211.)"""

    image_size: Any
    patch_size: Any
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    use_rotary: bool = True
    use_ds_conv: bool = True
    use_glu: bool = True
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, *, deterministic: bool = True):
        b, h, w, c = img.shape
        ph, pw = pair(self.patch_size)
        gh = h // ph
        x = img.reshape(b, gh, ph, w // pw, pw, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, -1, ph * pw * c)
        x = nn.Dense(self.dim, dtype=self.dtype, name="patch_proj")(x)
        n = x.shape[1]
        cls = self.param("cls_token", nn.initializers.normal(1.0), (1, 1, self.dim))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.dim)), x], axis=1
        )
        x = nn.Dropout(self.emb_dropout)(x, deterministic=deterministic)

        rot_dim = (self.dim_head // 4) * 4
        sin, cos = _axial_rotary(rot_dim, gh)
        inner = self.heads * self.dim_head

        for i in range(self.depth):
            xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"l{i}_norm1")(x)
            if self.use_ds_conv:
                # SpatialConv query: depthwise+pointwise conv on the grid,
                # linear on the CLS token (ref :67-82)
                cls_q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                                 name=f"l{i}_cls_q")(xn[:, :1])
                grid = xn[:, 1:].reshape(b, gh, gh, self.dim)
                grid = nn.Conv(
                    self.dim, (5, 5), padding=2, feature_group_count=self.dim,
                    use_bias=False, dtype=self.dtype, name=f"l{i}_q_dw",
                )(grid)
                grid = nn.Conv(inner, (1, 1), use_bias=False, dtype=self.dtype,
                               name=f"l{i}_q_pw")(grid)
                q = jnp.concatenate(
                    [cls_q, grid.reshape(b, n, inner)], axis=1
                )
            else:
                q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                             name=f"l{i}_to_q")(xn)
            kv = nn.Dense(inner * 2, use_bias=False, dtype=self.dtype,
                          name=f"l{i}_to_kv")(xn)
            k, v = jnp.split(kv, 2, axis=-1)

            def heads_first(t):
                return t.reshape(b, n + 1, self.heads, self.dim_head).transpose(0, 2, 1, 3)

            q, k, v = heads_first(q), heads_first(k), heads_first(v)

            if self.use_rotary:
                def rot(t):
                    t_cls, t_grid = t[..., :1, :], t[..., 1:, :]
                    tr, tp = t_grid[..., :rot_dim], t_grid[..., rot_dim:]
                    tr = tr * cos.astype(t.dtype) + _rotate_every_two(tr) * sin.astype(t.dtype)
                    return jnp.concatenate(
                        [t_cls, jnp.concatenate([tr, tp], axis=-1)], axis=-2
                    )

                q, k = rot(q), rot(k)

            dots = jnp.einsum(
                "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
            ) * (self.dim_head**-0.5)
            attn = robust_softmax(dots, robust=self.robust)
            attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
            out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
            out = out.transpose(0, 2, 1, 3).reshape(b, n + 1, inner)
            out = nn.Dense(self.dim, dtype=self.dtype, name=f"l{i}_to_out")(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
            x = x + out

            xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"l{i}_norm2")(x)
            if self.use_glu:
                f = nn.Dense(self.mlp_dim * 2, dtype=self.dtype, name=f"l{i}_ff1")(xn)
                val, gates = jnp.split(f, 2, axis=-1)
                f = gelu(gates) * val
            else:
                f = nn.Dense(self.mlp_dim, dtype=self.dtype, name=f"l{i}_ff1")(xn)
                f = gelu(f)
            f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
            f = nn.Dense(self.dim, dtype=self.dtype, name=f"l{i}_ff2")(f)
            f = nn.Dropout(self.dropout)(f, deterministic=deterministic)
            x = x + f

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="head_norm")(x[:, 0])
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
