"""PatchConvNet — conv trunk + learned-aggregation head (ref patch_convnet.py,
DeiT "Augmenting Convolutional networks with attention-based aggregation").

Conv stem: 4× stride-2 3×3 convs with GELU (ref patch_convnet.py:277-311);
trunk: ``depth`` LayerScale'd SE-conv blocks operating on the token grid
(``Conv_blocks_se`` 1×1 → GELU → depthwise 3×3 → GELU → SE(0.25) → 1×1,
ref :221-244); head: CLS token(s) cross-attend to patches through
``Learned_Aggregation_Layer`` (ref :41-106; multi-class variant :108-170)
inside ``depth_token_only`` LayerScale'd token blocks (ref :172-218), final
LN + linear head(s).

``robust``: the reference applies the Sinkhorn schedule to the [1, N]
CLS-attention row (ref :90-97 — with the ``torch.softmax(attn)`` missing-dim
bug; implemented here with the evident intent, dim=-1). NOTE: on a single-row
matrix the column normalization maps every entry to 1, so the schedule
degenerates to UNIFORM attention over patches — faithful to the reference's
arithmetic; the single-class robust head is mean pooling. The multi-CLS
variant (rows = num_classes) is non-degenerate.

Builders S60/S120/B60/B120/L60/L120/S60_multi per ref :487-608.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops import robust_softmax, gelu
from ..utils import trunc_normal_init
from .layers import DropPath, SqueezeExcite

__all__ = [
    "PatchConvnet",
    "S60",
    "S120",
    "B60",
    "B120",
    "L60",
    "L120",
    "S60_multi",
]

_dense_init = dict(
    kernel_init=trunc_normal_init(0.02), bias_init=nn.initializers.zeros
)


class _Mlp(nn.Module):
    """(ref patch_convnet.py:15-38.)"""

    hidden: int
    out: int
    drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(self.hidden, dtype=self.dtype, **_dense_init, name="fc1")(x)
        x = gelu(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out, dtype=self.dtype, **_dense_init, name="fc2")(x)
        return nn.Dropout(self.drop)(x, deterministic=deterministic)


class LearnedAggregationLayer(nn.Module):
    """CLS-query attention pooling (ref patch_convnet.py:41-106; multi :108-170).
    ``num_queries`` CLS rows attend over the patch tokens."""

    dim: int
    num_heads: int = 1
    num_queries: int = 1
    qkv_bias: bool = False
    qk_scale: float | None = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    robust: bool = False
    multi: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, n, c = x.shape
        h = self.num_heads
        dh = c // h
        scale = self.qk_scale or dh**-0.5
        nq = self.num_queries
        if self.multi:
            q_in, kv_in = x[:, :nq], x[:, nq:]
        else:
            q_in, kv_in = x[:, :nq], x
        q = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, **_dense_init, name="q")(q_in)
        k = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, **_dense_init, name="k")(kv_in)
        v = nn.Dense(c, use_bias=self.qkv_bias, dtype=self.dtype, **_dense_init, name="v")(kv_in)
        m = kv_in.shape[1]
        q = q.reshape(b, nq, h, dh).transpose(0, 2, 1, 3) * scale
        k = k.reshape(b, m, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, m, h, dh).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)
        attn = robust_softmax(attn, robust=self.robust)
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, c)
        out = nn.Dense(c, dtype=self.dtype, **_dense_init, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class ConvBlockSE(nn.Module):
    """(ref patch_convnet.py:221-244.)"""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        side = int(round(n**0.5))
        y = x.reshape(b, side, side, c)
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="conv1")(y)
        y = gelu(y)
        y = nn.Conv(
            self.dim, (3, 3), padding=1, feature_group_count=self.dim,
            dtype=self.dtype, name="dwconv",
        )(y)
        y = gelu(y)
        y = SqueezeExcite(self.dim, rd_ratio=0.25, dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="conv2")(y)
        return y.reshape(b, n, c)


class PatchConvnet(nn.Module):
    """(ref patch_convnet.py:313-484.)"""

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 1
    qkv_bias: bool = False
    qk_scale: float | None = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    depth_token_only: int = 1
    mlp_ratio_clstk: float = 3.0
    init_scale: float = 1e-4
    # torch nn.LayerNorm default; the size builders pass 1e-6
    # (ref patch_convnet.py:494 norm_layer=partial(nn.LayerNorm, eps=1e-6))
    norm_eps: float = 1e-5
    dpr_constant: bool = True
    multiclass: bool = False
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, return_features: bool = False):
        ed = self.embed_dim
        # ConvStem (ref :277-311): 4× stride-2 conv3x3 with GELU between
        for i, ch in enumerate((ed // 8, ed // 4, ed // 2, ed)):
            if i:
                x = gelu(x)
            x = nn.Conv(
                ch, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                dtype=self.dtype, name=f"stem{i}",
            )(x)
        b = x.shape[0]
        x = x.reshape(b, -1, ed)

        dpr = (
            [self.drop_path_rate] * self.depth
            if self.dpr_constant
            else [self.drop_path_rate * i / max(self.depth - 1, 1) for i in range(self.depth)]
        )
        for i in range(self.depth):
            gamma = self.param(
                f"gamma_1_{i}", nn.initializers.constant(self.init_scale), (ed,)
            )
            h = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name=f"norm1_{i}")(x)
            h = ConvBlockSE(ed, dtype=self.dtype, name=f"conv_block_{i}")(h)
            x = x + DropPath(dpr[i])(
                gamma.astype(h.dtype) * h, deterministic=deterministic
            )

        nq = self.num_classes if self.multiclass else 1
        cls = self.param("cls_token", trunc_normal_init(0.02), (1, nq, ed))
        cls_tokens = jnp.broadcast_to(cls.astype(x.dtype), (b, nq, ed))

        for i in range(self.depth_token_only):
            g1 = self.param(
                f"tok_gamma_1_{i}", nn.initializers.constant(self.init_scale), (ed,)
            )
            g2 = self.param(
                f"tok_gamma_2_{i}", nn.initializers.constant(self.init_scale), (ed,)
            )
            u = jnp.concatenate([cls_tokens, x], axis=1)
            u = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name=f"tok_norm1_{i}")(u)
            att = LearnedAggregationLayer(
                ed, num_heads=self.num_heads, num_queries=nq,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                attn_drop=self.attn_drop_rate, proj_drop=self.drop_rate,
                robust=self.robust, multi=self.multiclass, dtype=self.dtype,
                name=f"tok_attn_{i}",
            )(u, deterministic=deterministic)
            cls_tokens = cls_tokens + g1.astype(att.dtype) * att
            m = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name=f"tok_norm2_{i}")(cls_tokens)
            m = _Mlp(
                int(ed * self.mlp_ratio_clstk), ed, drop=self.drop_rate,
                dtype=self.dtype, name=f"tok_mlp_{i}",
            )(m, deterministic=deterministic)
            cls_tokens = cls_tokens + g2.astype(m.dtype) * m

        x = jnp.concatenate([cls_tokens, x], axis=1)
        x = nn.LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm")(x)

        if not self.multiclass:
            feat = x[:, 0]
            if return_features:
                return feat
            return nn.Dense(
                self.num_classes, dtype=self.dtype, **_dense_init, name="head"
            )(feat)
        feats = x[:, : self.num_classes]  # [B, K, C]
        # per-class heads (ref :480-484): K independent Linear(C→1)
        w = self.param(
            "multi_head_kernel", trunc_normal_init(0.02),
            (self.num_classes, ed),
        )
        bias = self.param("multi_head_bias", nn.initializers.zeros, (self.num_classes,))
        return jnp.einsum("bkc,kc->bk", feats, w.astype(feats.dtype)) + bias


def _builder(embed_dim, depth, **defaults):
    def build(pretrained=False, *, num_classes=1000, image_size=224, robust=False,
              dtype=jnp.float32, **kw):
        cfg = dict(
            patch_size=16, embed_dim=embed_dim, depth=depth, num_heads=1,
            qkv_bias=True, depth_token_only=1, mlp_ratio_clstk=3.0,
            norm_eps=1e-6,
        )
        cfg.update(defaults)
        cfg.update(kw)
        return PatchConvnet(
            img_size=image_size, num_classes=num_classes, robust=robust,
            dtype=dtype, **cfg,
        )

    return build


S60 = _builder(384, 60)                       # ref :487
S120 = _builder(384, 120, init_scale=1e-6)    # ref :505
B60 = _builder(768, 60, init_scale=1e-6)      # ref :523
B120 = _builder(768, 120, init_scale=1e-6)    # ref :539
L60 = _builder(1024, 60, init_scale=1e-6)     # ref :556
L120 = _builder(1024, 120, init_scale=1e-6)   # ref :574
S60_multi = _builder(384, 60, multiclass=True)  # ref :592
