"""LeViT — hybrid conv/attention with fused-BN linears (ref levit.py).

Conv stem ``b16`` (4× stride-2 Conv-BN-Hardswish, ref levit.py:166-176),
stages of (Attention + MLP) residual blocks built from Linear+BN pairs
(ref levit.py:105-133), stride-2 ``AttentionSubsample`` between stages
(ref levit.py:298-507), learned attention-bias tables indexed by absolute
relative offset (ref levit.py:225-238, :336-355 — the index maps are
computed with numpy at trace time and the gather constant-folds under jit),
mean pool + BN+Linear head (ref levit.py:135-163).

``robust`` applies the 3-iter+final-row Sinkhorn schedule inline in both
attention types (ref levit.py:271-278, :393-400) — including on the
NON-SQUARE (N_↓ × N) subsample attention, where column normalization runs
over the longer key axis.

BatchNorm: under jit data-parallelism the batch stats are computed over the
global batch — the reference's ``--sync-batchnorm`` semantics for free.
BN-fusion for inference (ref levit.py:86-102 ``fuse()``) is
:func:`fuse_levit_variables`: folds BN scale/shift into the preceding
conv/dense kernel (every conv/dense carries a zero bias slot for this).

Builders ``LeViT_128S/128/192/256/384`` per ref levit.py:13-48, :560-587;
analytic FLOPs via :func:`levit_flops` (the reference's global
``FLOPS_COUNTER``, levit.py:54, :515).
"""

from __future__ import annotations

import functools
import itertools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .. import ops
from ..ops import robust_softmax
from .layers import DropPath

__all__ = [
    "LeViT",
    "LeViT_128S",
    "LeViT_128",
    "LeViT_192",
    "LeViT_256",
    "LeViT_384",
    "fuse_levit_variables",
    "levit_flops",
]

specification = {
    "LeViT_128S": {"C": "128_256_384", "D": 16, "N": "4_6_8", "X": "2_3_4", "drop_path": 0},
    "LeViT_128": {"C": "128_256_384", "D": 16, "N": "4_8_12", "X": "4_4_4", "drop_path": 0},
    "LeViT_192": {"C": "192_288_384", "D": 32, "N": "3_5_6", "X": "4_4_4", "drop_path": 0},
    "LeViT_256": {"C": "256_384_512", "D": 32, "N": "4_6_8", "X": "4_4_4", "drop_path": 0},
    "LeViT_384": {"C": "384_512_768", "D": 32, "N": "6_9_12", "X": "4_4_4", "drop_path": 0.1},
}


class ConvBN(nn.Module):
    """Conv(no-op bias slot) + BN (ref levit.py:57-83). NHWC."""

    out: int
    ks: int = 1
    stride: int = 1
    pad: int = 0
    bn_weight_init: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Conv(
            self.out, (self.ks, self.ks), strides=(self.stride, self.stride),
            padding=self.pad, use_bias=True,
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="c",
        )(x)
        return nn.BatchNorm(
            use_running_average=deterministic,
            scale_init=nn.initializers.constant(self.bn_weight_init),
            dtype=self.dtype, name="bn",
        )(x)


class LinearBN(nn.Module):
    """Linear + BN over channels (ref levit.py:105-133)."""

    out: int
    bn_weight_init: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(
            self.out, use_bias=True, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="c",
        )(x)
        return nn.BatchNorm(
            use_running_average=deterministic,
            scale_init=nn.initializers.constant(self.bn_weight_init),
            dtype=self.dtype, name="bn",
        )(x)


@functools.lru_cache(maxsize=64)
def _bias_index_square(resolution: int) -> tuple[np.ndarray, int]:
    """(ref levit.py:225-238.)"""
    points = list(itertools.product(range(resolution), range(resolution)))
    offsets: dict[tuple, int] = {}
    idxs = []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    n = len(points)
    return np.asarray(idxs, np.int32).reshape(n, n), len(offsets)


@functools.lru_cache(maxsize=64)
def _bias_index_subsample(resolution: int, resolution_: int, stride: int) -> tuple[np.ndarray, int]:
    """(ref levit.py:336-355.)"""
    points = list(itertools.product(range(resolution), range(resolution)))
    points_ = list(itertools.product(range(resolution_), range(resolution_)))
    offsets: dict[tuple, int] = {}
    idxs = []
    for p1 in points_:
        for p2 in points:
            off = (abs(p1[0] * stride - p2[0]), abs(p1[1] * stride - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    return (
        np.asarray(idxs, np.int32).reshape(len(points_), len(points)),
        len(offsets),
    )


class LevitAttention(nn.Module):
    """(ref levit.py:198-296.)"""

    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: int
    resolution: int
    robust: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, n, _ = x.shape
        kd, h = self.key_dim, self.num_heads
        d = int(self.attn_ratio * kd)
        qkv = LinearBN(h * (2 * kd + d), dtype=self.dtype, name="qkv")(
            x, deterministic=deterministic
        )
        qkv = qkv.reshape(b, n, h, 2 * kd + d)
        q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))

        idxs, n_off = _bias_index_square(self.resolution)
        table = self.param("attention_biases", nn.initializers.zeros, (h, n_off))
        bias = table[:, jnp.asarray(idxs)]  # [h, N, N]

        if self.robust and ops.biased_dispatch(True, b, h, n, kd, d, 1):
            # robust fast path: fused Sinkhorn kernel with the per-head bias
            # table as the additive operand (nW=1; ref levit.py:271-278)
            out = ops.biased_attention(
                q, k, v, bias[None].astype(jnp.float32), scale=kd**-0.5,
                robust=True, num_windows=1,
            )
        else:
            # plain path: XLA's batched GEMMs beat a fused kernel at LeViT's
            # map sizes (RESULTS.md "windowed kernel: retired")
            attn = jnp.einsum(
                "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
            ) * (kd**-0.5) + bias[None].astype(jnp.float32)
            attn = robust_softmax(attn, robust=self.robust)
            out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        out = nn.hard_swish(out)
        return LinearBN(self.dim, bn_weight_init=0.0, dtype=self.dtype, name="proj")(
            out, deterministic=deterministic
        )


class LevitAttentionSubsample(nn.Module):
    """Stride-2 downsampling cross-attention (ref levit.py:298-404)."""

    out_dim: int
    key_dim: int
    num_heads: int
    attn_ratio: int
    stride: int
    resolution: int
    resolution_: int
    robust: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        b, n, c = x.shape
        kd, h = self.key_dim, self.num_heads
        d = int(self.attn_ratio * kd)
        n_ = self.resolution_**2

        kv = LinearBN(h * (kd + d), dtype=self.dtype, name="kv")(
            x, deterministic=deterministic
        ).reshape(b, n, h, kd + d)
        k, v = jnp.split(kv, [kd], axis=-1)
        k, v = k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)

        xs = x.reshape(b, self.resolution, self.resolution, c)[
            :, :: self.stride, :: self.stride
        ].reshape(b, n_, c)
        q = LinearBN(h * kd, dtype=self.dtype, name="q")(
            xs, deterministic=deterministic
        ).reshape(b, n_, h, kd).transpose(0, 2, 1, 3)

        idxs, n_off = _bias_index_subsample(
            self.resolution, self.resolution_, self.stride
        )
        table = self.param("attention_biases", nn.initializers.zeros, (h, n_off))
        bias = table[:, jnp.asarray(idxs)]  # [h, N_, N]

        attn = jnp.einsum(
            "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
        ) * (kd**-0.5) + bias[None].astype(jnp.float32)
        attn = robust_softmax(attn, robust=self.robust)
        out = jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n_, h * d)
        out = nn.hard_swish(out)
        return LinearBN(self.out_dim, dtype=self.dtype, name="proj")(
            out, deterministic=deterministic
        )


class _MLP(nn.Module):
    dim: int
    hidden: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = LinearBN(self.hidden, dtype=self.dtype, name="fc1")(
            x, deterministic=deterministic
        )
        x = nn.hard_swish(x)
        return LinearBN(self.dim, bn_weight_init=0.0, dtype=self.dtype, name="fc2")(
            x, deterministic=deterministic
        )


class LeViT(nn.Module):
    """(ref levit.py:406-528.)"""

    img_size: int = 224
    patch_size: int = 16
    num_classes: int = 1000
    embed_dim: Sequence[int] = (192,)
    key_dim: Sequence[int] = (64,)
    depth: Sequence[int] = (12,)
    num_heads: Sequence[int] = (3,)
    attn_ratio: Sequence[int] = (2,)
    mlp_ratio: Sequence[int] = (2,)
    down_ops: Sequence[Sequence] = ()
    drop_path: float = 0.0
    robust: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, return_features: bool = False):
        # b16 conv stem (ref levit.py:166-176)
        n0 = self.embed_dim[0]
        for i, ch in enumerate((n0 // 8, n0 // 4, n0 // 2, n0)):
            x = ConvBN(ch, ks=3, stride=2, pad=1, dtype=self.dtype, name=f"stem{i}")(
                x, deterministic=deterministic
            )
            if i < 3:
                x = nn.hard_swish(x)
        b = x.shape[0]
        x = x.reshape(b, -1, self.embed_dim[0])

        sd = DropPath(self.drop_path)
        resolution = self.img_size // self.patch_size
        down_ops = list(self.down_ops) + [("",)]
        blk = 0
        for i, (ed, kd, dpth, nh, ar, mr, do) in enumerate(
            zip(self.embed_dim, self.key_dim, self.depth, self.num_heads,
                self.attn_ratio, self.mlp_ratio, down_ops)
        ):
            for _ in range(dpth):
                x = x + sd(
                    LevitAttention(
                        ed, kd, nh, ar, resolution, self.robust,
                        dtype=self.dtype, name=f"block{blk}_attn",
                    )(x, deterministic=deterministic),
                    deterministic=deterministic,
                )
                if mr > 0:
                    x = x + sd(
                        _MLP(ed, int(ed * mr), dtype=self.dtype, name=f"block{blk}_mlp")(
                            x, deterministic=deterministic
                        ),
                        deterministic=deterministic,
                    )
                blk += 1
            if do[0] == "Subsample":
                resolution_ = (resolution - 1) // do[5] + 1
                x = LevitAttentionSubsample(
                    self.embed_dim[i + 1], key_dim=do[1], num_heads=do[2],
                    attn_ratio=do[3], stride=do[5], resolution=resolution,
                    resolution_=resolution_, robust=self.robust,
                    dtype=self.dtype, name=f"downsample{i}",
                )(x, deterministic=deterministic)
                resolution = resolution_
                if do[4] > 0:
                    x = x + sd(
                        _MLP(
                            self.embed_dim[i + 1], int(self.embed_dim[i + 1] * do[4]),
                            dtype=self.dtype, name=f"downsample{i}_mlp",
                        )(x, deterministic=deterministic),
                        deterministic=deterministic,
                    )

        x = jnp.mean(x, axis=1)
        if return_features:
            return x
        if self.num_classes > 0:
            x = nn.BatchNorm(
                use_running_average=deterministic, dtype=self.dtype, name="head_bn"
            )(x)
            x = nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x


def _factory(C, D, X, N, drop_path, num_classes, robust, img_size=224, dtype=jnp.float32, **kw):
    """(ref levit.py:531-557.)"""
    embed_dim = [int(v) for v in C.split("_")]
    num_heads = [int(v) for v in N.split("_")]
    depth = [int(v) for v in X.split("_")]
    return LeViT(
        img_size=img_size,
        patch_size=16,
        embed_dim=tuple(embed_dim),
        num_heads=tuple(num_heads),
        key_dim=(D,) * 3,
        depth=tuple(depth),
        attn_ratio=(2, 2, 2),
        mlp_ratio=(2, 2, 2),
        down_ops=(
            ("Subsample", D, embed_dim[0] // D, 4, 2, 2),
            ("Subsample", D, embed_dim[1] // D, 4, 2, 2),
        ),
        num_classes=num_classes,
        drop_path=drop_path,
        robust=robust,
        dtype=dtype,
        **kw,
    )


def _make_builder(name):
    def build(num_classes=1000, fuse=False, robust=False, image_size=224, **kw):
        kw.setdefault("img_size", image_size)
        return _factory(
            **specification[name], num_classes=num_classes, robust=robust, **kw
        )

    build.__name__ = name
    return build


LeViT_128S = _make_builder("LeViT_128S")
LeViT_128 = _make_builder("LeViT_128")
LeViT_192 = _make_builder("LeViT_192")
LeViT_256 = _make_builder("LeViT_256")
LeViT_384 = _make_builder("LeViT_384")


def fuse_levit_variables(variables):
    """Fold every BN into the preceding conv/dense kernel+bias and reset the
    BN to identity — the reference's ``fuse()`` inference transform
    (ref levit.py:86-102, :119-127). Returns new variables; the same module
    then computes the fused function in eval mode."""
    from flax.core import unfreeze

    eps = 1e-5
    params = unfreeze(jax.device_get(variables["params"]))
    stats = unfreeze(jax.device_get(variables.get("batch_stats", {})))

    def walk(p, s):
        new_p, new_s = {}, {}
        for key, sub in p.items():
            if not isinstance(sub, dict):
                new_p[key] = sub
                continue
            sk = s.get(key, {})
            if (
                isinstance(sub.get("c"), dict)
                and isinstance(sub.get("bn"), dict)
                and "mean" in sk.get("bn", {})
            ):
                cs, bs = dict(sub["c"]), dict(sub["bn"])
                st = dict(sk["bn"])
                w = bs["scale"] / np.sqrt(st["var"] + eps)
                # conv kernels HWIO / dense IO — scale the output channel
                cs["kernel"] = cs["kernel"] * w
                cs["bias"] = cs.get("bias", 0.0) * w + bs["bias"] - st["mean"] * w
                new_p[key] = {
                    "c": cs,
                    "bn": {
                        "scale": np.ones_like(bs["scale"]),
                        "bias": np.zeros_like(bs["bias"]),
                    },
                }
                new_s[key] = {
                    "bn": {
                        "mean": np.zeros_like(st["mean"]),
                        # sqrt(var + eps) == 1 exactly after fusion
                        "var": np.ones_like(st["var"]) - eps,
                    }
                }
            else:
                np_, ns_ = walk(sub, sk)
                new_p[key] = np_
                if ns_ or sk:
                    new_s[key] = {**sk, **ns_}
        return new_p, new_s

    new_params, new_stats = walk(params, stats)
    out = dict(variables)
    out["params"] = new_params
    out["batch_stats"] = new_stats
    return out


def levit_flops(model: LeViT) -> int:
    """Analytic attention FLOPs (the reference's FLOPS_COUNTER semantics,
    ref levit.py:240-246, :357-366 — attention terms; conv/linear terms are
    proportional and omitted by the same accounting)."""
    total = 0
    resolution = model.img_size // model.patch_size
    down_ops = list(model.down_ops) + [("",)]
    for i, (ed, kd, dpth, nh, ar, mr, do) in enumerate(
        zip(model.embed_dim, model.key_dim, model.depth, model.num_heads,
            model.attn_ratio, model.mlp_ratio, down_ops)
    ):
        d = int(ar * kd)
        total += dpth * (nh * resolution**4 * kd + nh * resolution**4
                         + nh * d * resolution**4)
        if do and do[0] == "Subsample":
            r_ = (resolution - 1) // do[5] + 1
            dd = int(do[3] * do[1])
            total += (do[2] * resolution**2 * r_**2 * do[1]
                      + do[2] * resolution**2 * r_**2
                      + do[2] * resolution**2 * r_**2 * dd)
            resolution = r_
    return total
