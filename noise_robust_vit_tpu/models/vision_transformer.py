"""Torchvision-style VisionTransformer + size builders (ref vit.py:178-519).

Conv patchify stem (ref vit.py:237-242) or multi-layer conv-BN-ReLU stem
(ref vit.py:212-235, per arXiv:2106.14881), CLS token + learned posemb with
dropout (ref vit.py:151-153, :247), pre-LN encoder blocks with biased-qkv MHA
(ref vit.py:87-130 — the vendored ``utils.MultiheadAttention`` with the
``robust`` flag, utils.py:600-1003), optional representation head
(ref vit.py:263-270), zero-init classifier head (ref vit.py:304-306).

Builders ``vit_b_16/b_32/l_16/l_32/h_14`` per ref vit.py:377-519.
Checkpoint resolution transfer (``interpolate_embeddings``, ref vit.py:
522-603) is `ops.resize_posemb_grid` applied to the posemb param.

The vendored-MHA robust schedule is 4 Sinkhorn iterations with no final row
normalization (ref utils.py:218-224) — different from the inline-model
schedule; both are reproduced faithfully.

Upstream, this model cannot actually run: the vendored functional MHA feeds
4-D [B,H,N,D] views (utils.py:567-570) into a 3-D-only ``torch.bmm`` SDPA
(utils.py:210), calls an unimported ``linear`` (utils.py:579), and its
``need_weights=False`` return is a bare tensor that the two-value unpack at
utils.py:572 silently splits along the batch dim. Worse, ``self.robust``
(utils.py:668) is never read — forward's per-call ``robust=False`` default
wins, so upstream ``VisionTransformer(robust=True)`` silently runs VANILLA
attention. This rebuild implements the evident intent (robust ⇒ 4-iteration
Sinkhorn per head); tests/test_parity.py::TestVisionTransformerParity patches
exactly these landmines in the reference and verifies logit parity for both
modes.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops import gelu
from ..utils import trunc_normal_init
from .layers import Attention, DropPath

__all__ = [
    "ConvStemConfig",
    "VisionTransformer",
    "vit_b_16",
    "vit_b_32",
    "vit_l_16",
    "vit_l_32",
    "vit_h_14",
    "interpolate_embeddings",
]


class ConvStemConfig(NamedTuple):
    out_channels: int
    kernel_size: int
    stride: int


class MLPBlock(nn.Module):
    """(ref vit.py:35-66) Linear → GELU → Dropout → Linear → Dropout."""

    mlp_dim: int
    out_dim: int
    dropout: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        init = nn.initializers.xavier_uniform()
        x = nn.Dense(
            self.mlp_dim, kernel_init=init,
            bias_init=nn.initializers.normal(1e-6), dtype=self.dtype, name="fc1",
        )(x)
        x = gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(
            self.out_dim, kernel_init=init,
            bias_init=nn.initializers.normal(1e-6), dtype=self.dtype, name="fc2",
        )(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class EncoderBlock(nn.Module):
    """(ref vit.py:87-130) pre-LN attention + pre-LN MLP with residuals."""

    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float
    attention_dropout: float
    robust: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_1")(x)
        h = Attention(
            self.hidden_dim,
            heads=self.num_heads,
            dim_head=self.hidden_dim // self.num_heads,
            dropout=self.attention_dropout,
            robust=self.robust,
            qkv_bias=True,
            out_bias=True,
            pre_norm=False,
            # vendored-MHA schedule: 4 iters, no final row norm
            # (ref utils.py:218-224)
            sinkhorn_iters=4,
            final_row_norm=False,
            dtype=self.dtype,
            name="self_attention",
        )(h, deterministic=deterministic)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = x + h
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln_2")(x)
        y = MLPBlock(
            self.mlp_dim, self.hidden_dim, self.dropout, dtype=self.dtype, name="mlp"
        )(y, deterministic=deterministic)
        return x + y


class Encoder(nn.Module):
    """(ref vit.py:133-176) posemb + dropout + blocks + final LN."""

    seq_length: int
    num_layers: int
    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float
    attention_dropout: float
    robust: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(0.02),
            (1, self.seq_length, self.hidden_dim),
        )
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        for i in range(self.num_layers):
            x = EncoderBlock(
                self.num_heads,
                self.hidden_dim,
                self.mlp_dim,
                self.dropout,
                self.attention_dropout,
                self.robust,
                dtype=self.dtype,
                name=f"layer_{i}",
            )(x, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="ln")(x)


class VisionTransformer(nn.Module):
    """(ref vit.py:178-374) — NHWC input."""

    image_size: int
    patch_size: int
    num_layers: int
    num_heads: int
    hidden_dim: int
    mlp_dim: int
    dropout: float = 0.0
    attention_dropout: float = 0.0
    num_classes: int = 1000
    representation_size: Optional[int] = None
    conv_stem_configs: Optional[Sequence[ConvStemConfig]] = None
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, return_features: bool = False):
        if x.shape[1] != self.image_size or x.shape[2] != self.image_size:
            raise ValueError(f"expected {self.image_size}px input, got {x.shape}")
        if self.conv_stem_configs is not None:
            # conv-BN-ReLU stem (ref vit.py:212-235)
            for i, cfg in enumerate(self.conv_stem_configs):
                x = nn.Conv(
                    cfg.out_channels,
                    (cfg.kernel_size, cfg.kernel_size),
                    strides=(cfg.stride, cfg.stride),
                    use_bias=False,
                    dtype=self.dtype,
                    name=f"conv_bn_relu_{i}_conv",
                )(x)
                x = nn.BatchNorm(
                    use_running_average=deterministic,
                    dtype=self.dtype,
                    name=f"conv_bn_relu_{i}_bn",
                )(x)
                x = nn.relu(x)
            x = nn.Conv(
                self.hidden_dim, (1, 1), dtype=self.dtype, name="conv_last"
            )(x)
        else:
            fan_in = 3 * self.patch_size * self.patch_size
            x = nn.Conv(
                self.hidden_dim,
                (self.patch_size, self.patch_size),
                strides=(self.patch_size, self.patch_size),
                kernel_init=trunc_normal_init(std=math.sqrt(1 / fan_in)),
                dtype=self.dtype,
                name="conv_proj",
            )(x)
        b = x.shape[0]
        x = x.reshape(b, -1, self.hidden_dim)

        cls = self.param(
            "class_token", nn.initializers.zeros, (1, 1, self.hidden_dim)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.hidden_dim)), x], axis=1
        )

        x = Encoder(
            seq_length=(self.image_size // self.patch_size) ** 2 + 1,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            hidden_dim=self.hidden_dim,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            attention_dropout=self.attention_dropout,
            robust=self.robust,
            dtype=self.dtype,
            name="encoder",
        )(x, deterministic=deterministic)

        x = x[:, 0]
        if return_features:
            return x
        if self.representation_size is not None:
            x = nn.Dense(
                self.representation_size,
                kernel_init=trunc_normal_init(
                    std=math.sqrt(1 / self.hidden_dim)
                ),
                dtype=self.dtype,
                name="pre_logits",
            )(x)
            x = jnp.tanh(x)
        # zero-init head (ref vit.py:304-306)
        return nn.Dense(
            self.num_classes,
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="head",
        )(x)


def _builder(patch, layers, heads, hidden, mlp):
    def build(*, num_classes=1000, image_size=224, robust=False, dropout=0.0,
              attention_dropout=0.0, dtype=jnp.float32, **kw):
        return VisionTransformer(
            image_size=image_size,
            patch_size=patch,
            num_layers=layers,
            num_heads=heads,
            hidden_dim=hidden,
            mlp_dim=mlp,
            dropout=dropout,
            attention_dropout=attention_dropout,
            num_classes=num_classes,
            robust=robust,
            dtype=dtype,
            **kw,
        )

    return build


vit_b_16 = _builder(16, 12, 12, 768, 3072)   # ref vit.py:377
vit_b_32 = _builder(32, 12, 12, 768, 3072)   # ref vit.py:406
vit_l_16 = _builder(16, 24, 16, 1024, 4096)  # ref vit.py:435
vit_l_32 = _builder(32, 24, 16, 1024, 4096)  # ref vit.py:464
vit_h_14 = _builder(14, 32, 16, 1280, 5120)  # ref vit.py:493


def interpolate_embeddings(params: dict, new_image_size: int, patch_size: int,
                           interpolation_mode: str = "bicubic") -> dict:
    """Resize the encoder pos-embedding in a param pytree for a new input
    resolution (ref vit.py:522-603). Returns a new pytree."""
    import jax

    from ..ops import resize_posemb_grid

    flat = dict(params)

    def visit(tree):
        if isinstance(tree, dict):
            out = {}
            for k, v in tree.items():
                if k == "pos_embedding" and hasattr(v, "shape"):
                    n = v.shape[1] - 1
                    side = int(round(n**0.5))
                    new_side = new_image_size // patch_size
                    out[k] = resize_posemb_grid(
                        v, (new_side, new_side), (side, side),
                        num_prefix_tokens=1, method=interpolation_mode,
                    )
                else:
                    out[k] = visit(v)
            return out
        return tree

    return jax.tree_util.tree_map(lambda x: x, visit(flat))
