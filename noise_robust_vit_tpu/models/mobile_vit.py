"""MobileViT — MV2 (MobileNetV2) blocks + local-global-local transformer
blocks (ref mobile_vit.py).

Conv stem → MV2 stack → three (MV2-downsample, MobileViTBlock) pairs; a
MobileViTBlock lifts the map to tokens per pixel-position group, runs a
transformer across spatial groups, folds back, and fuses with the input via
concat+conv (ref mobile_vit.py:148-180). Head: 1×1 conv-BN-SiLU → global
mean → bias-free linear (ref :243-247)."""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils import pair
from .layers import Transformer

__all__ = ["MobileViT"]


class _ConvBnSilu(nn.Module):
    out: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        pad = 1 if self.kernel == 3 else 0
        x = nn.Conv(
            self.out, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding=pad, use_bias=False,
            dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=deterministic, dtype=self.dtype,
                         name="bn")(x)
        return nn.silu(x)


class _MV2Block(nn.Module):
    """(ref mobile_vit.py:101-146.)"""

    inp: int
    oup: int
    stride: int = 1
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        hidden = int(self.inp * self.expansion)
        use_res = self.stride == 1 and self.inp == self.oup
        y = x
        bn = lambda name: nn.BatchNorm(
            use_running_average=deterministic, dtype=self.dtype, name=name
        )
        if self.expansion != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                        name="pw")(y)
            y = bn("bn0")(y)
            y = nn.silu(y)
        y = nn.Conv(
            hidden, (3, 3), strides=(self.stride, self.stride), padding=1,
            feature_group_count=hidden, use_bias=False, dtype=self.dtype,
            name="dw",
        )(y)
        y = bn("bn1")(y)
        y = nn.silu(y)
        y = nn.Conv(self.oup, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pw_linear")(y)
        y = bn("bn2")(y)
        return x + y if use_res else y


class _MobileViTBlock(nn.Module):
    """(ref mobile_vit.py:148-180.)"""

    dim: int
    depth: int
    channel: int
    kernel_size: int
    patch_size: tuple[int, int]
    mlp_dim: int
    dropout: float = 0.0
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        ph, pw = self.patch_size
        y = x
        x = _ConvBnSilu(self.channel, self.kernel_size, dtype=self.dtype,
                        name="conv1")(x, deterministic=deterministic)
        x = _ConvBnSilu(self.dim, 1, dtype=self.dtype, name="conv2")(
            x, deterministic=deterministic
        )
        b, h, w, d = x.shape
        # 'b d (h ph) (w pw) -> b (ph pw) (h w) d' (ref :170-171)
        x = x.reshape(b, h // ph, ph, w // pw, pw, d)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b * ph * pw, -1, d)
        x = Transformer(
            self.dim, self.depth, 4, 8, self.mlp_dim, dropout=self.dropout,
            robust=self.robust, out_bias=True, ff_act=nn.silu,
            dtype=self.dtype, name="transformer",
        )(x, deterministic=deterministic)
        x = x.reshape(b, ph, pw, h // ph, w // pw, d)
        x = x.transpose(0, 3, 1, 4, 2, 5).reshape(b, h, w, d)
        x = _ConvBnSilu(self.channel, 1, dtype=self.dtype, name="conv3")(
            x, deterministic=deterministic
        )
        x = jnp.concatenate([x, y], axis=-1)
        return _ConvBnSilu(self.channel, self.kernel_size, dtype=self.dtype,
                           name="conv4")(x, deterministic=deterministic)


class MobileViT(nn.Module):
    """(ref mobile_vit.py:182-252.)"""

    image_size: tuple[int, int]
    dims: Sequence[int]
    channels: Sequence[int]
    num_classes: int
    expansion: int = 4
    kernel_size: int = 3
    patch_size: tuple[int, int] = (2, 2)
    depths: Sequence[int] = (2, 4, 3)
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        ch = list(self.channels)
        det = deterministic
        x = _ConvBnSilu(ch[0], 3, 2, dtype=self.dtype, name="conv1")(x, deterministic=det)
        x = _MV2Block(ch[0], ch[1], 1, self.expansion, dtype=self.dtype,
                      name="stem0")(x, deterministic=det)
        x = _MV2Block(ch[1], ch[2], 2, self.expansion, dtype=self.dtype,
                      name="stem1")(x, deterministic=det)
        x = _MV2Block(ch[2], ch[3], 1, self.expansion, dtype=self.dtype,
                      name="stem2")(x, deterministic=det)
        x = _MV2Block(ch[2], ch[3], 1, self.expansion, dtype=self.dtype,
                      name="stem3")(x, deterministic=det)

        mults = (2, 4, 4)
        for i in range(3):
            x = _MV2Block(
                ch[3 + 2 * i], ch[4 + 2 * i], 2, self.expansion,
                dtype=self.dtype, name=f"trunk{i}_mv2",
            )(x, deterministic=det)
            x = _MobileViTBlock(
                self.dims[i], self.depths[i], ch[5 + 2 * i], self.kernel_size,
                tuple(self.patch_size), int(self.dims[i] * mults[i]),
                robust=self.robust, dtype=self.dtype, name=f"trunk{i}_mvit",
            )(x, deterministic=det)

        x = _ConvBnSilu(ch[-1], 1, dtype=self.dtype, name="to_logits_conv")(
            x, deterministic=det
        )
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(self.num_classes, use_bias=False, dtype=self.dtype,
                        name="head")(x)
