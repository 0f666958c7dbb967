"""Architecture registry: name → constructor.

Plays the role of the reference's per-script arch switches
(ref examples/CIFAR100.py:66-88: levit / S60 / swin_t with a ``robust`` flag)
and ``torchvision.models.__dict__[arch]()`` lookups (ref baseline.py:60-64).
Grows as the zoo widens; every entry accepts
``(num_classes, image_size, robust, dtype)``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

_REGISTRY: dict[str, Callable] = {}

__all__ = ["register_model", "create_model", "list_models"]


def _lazy(module: str, cls: str):
    import importlib

    return getattr(importlib.import_module(f".{module}", __package__), cls)


def register_model(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def create_model(
    name: str,
    *,
    num_classes: int,
    image_size: int = 224,
    robust: bool = False,
    dtype: Any = jnp.float32,
    **kwargs,
):
    if name not in _REGISTRY:
        raise ValueError(f"unknown architecture {name!r}; known: {sorted(_REGISTRY)}")
    return _REGISTRY[name](
        num_classes=num_classes,
        image_size=image_size,
        robust=robust,
        dtype=dtype,
        **kwargs,
    )


def list_models() -> list[str]:
    return sorted(_REGISTRY)


def _register_builtins():
    from . import swin as _swin
    from . import vision_transformer as _vt
    from .cait import CaiT
    from .deepvit import DeepViT
    from .simple_vit import SimpleViT
    from .vit import ViT

    from . import levit as _levit
    from . import patch_convnet as _pc

    for name in ("swin_t", "swin_s", "swin_b", "swin_v2_t", "swin_v2_s", "swin_v2_b"):
        _REGISTRY[name] = getattr(_swin, name)
    for name in ("vit_b_16", "vit_b_32", "vit_l_16", "vit_l_32", "vit_h_14"):
        _REGISTRY[name] = getattr(_vt, name)
    for name in ("LeViT_128S", "LeViT_128", "LeViT_192", "LeViT_256", "LeViT_384"):
        _REGISTRY[name] = getattr(_levit, name)
    _REGISTRY["levit"] = _levit.LeViT_128S  # the CIFAR100.py arch switch name
    for name in ("S60", "S120", "B60", "B120", "L60", "L120", "S60_multi"):
        _REGISTRY[name] = getattr(_pc, name)

    from . import resnet as _rn

    for name in ("resnet18", "resnet34", "resnet50", "resnet101"):
        _REGISTRY[name] = getattr(_rn, name)

    from . import cct as _cct

    for name in ("cct_2", "cct_4", "cct_6", "cct_7", "cct_8", "cct_14", "cct_16"):
        _REGISTRY[name] = getattr(_cct, name)

    def _small_patch(image_size):
        return 4 if image_size <= 64 else 16

    @register_model("maxvit_t")
    def _maxvit_t(num_classes, image_size, robust, dtype, **kw):
        """MaxViT-Tiny (dim 64, depths (2,2,5,2) per the MaxViT paper)."""
        return _lazy("max_vit", "MaxViT")(
            num_classes=num_classes, dim=kw.pop("dim", 64),
            depth=kw.pop("depth", (2, 2, 5, 2)), robust=robust, dtype=dtype, **kw,
        )

    @register_model("deepvit_small")
    def _deepvit_small(num_classes, image_size, robust, dtype, **kw):
        return _lazy("deepvit", "DeepViT")(
            image_size=image_size, patch_size=_small_patch(image_size),
            num_classes=num_classes, dim=512, depth=8, heads=8, mlp_dim=1024,
            robust=robust, dtype=dtype, **kw,
        )

    @register_model("t2t_vit")
    def _t2t(num_classes, image_size, robust, dtype, **kw):
        return _lazy("t2t", "T2TViT")(
            image_size=image_size, num_classes=num_classes,
            dim=kw.pop("dim", 512), depth=kw.pop("depth", 6),
            heads=kw.pop("heads", 8), mlp_dim=kw.pop("mlp_dim", 1024),
            robust=robust, dtype=dtype, **kw,
        )

    @register_model("cross_vit_small")
    def _cross_vit(num_classes, image_size, robust, dtype, **kw):
        return _lazy("cross_vit", "CrossViT")(
            image_size=image_size, num_classes=num_classes,
            sm_dim=kw.pop("sm_dim", 192), lg_dim=kw.pop("lg_dim", 384),
            sm_patch_size=kw.pop("sm_patch_size", 8 if image_size <= 64 else 12),
            lg_patch_size=kw.pop("lg_patch_size", 16 if image_size <= 64 else 16),
            robust=robust, dtype=dtype, **kw,
        )

    @register_model("pit_small")
    def _pit(num_classes, image_size, robust, dtype, **kw):
        return _lazy("pit", "PiT")(
            image_size=image_size, patch_size=kw.pop("patch_size", 14),
            num_classes=num_classes, dim=kw.pop("dim", 64),
            depth=kw.pop("depth", (2, 6, 4)), heads=kw.pop("heads", (2, 4, 8)),
            mlp_dim=kw.pop("mlp_dim", 256), robust=robust, dtype=dtype, **kw,
        )

    @register_model("cvt_13")
    def _cvt(num_classes, image_size, robust, dtype, **kw):
        return _lazy("cvt", "CvT")(
            num_classes=num_classes, robust=robust, dtype=dtype, **kw,
        )

    @register_model("twins_svt_small")
    def _twins(num_classes, image_size, robust, dtype, **kw):
        return _lazy("twins_svt", "TwinsSVT")(
            num_classes=num_classes, robust=robust, dtype=dtype, **kw,
        )

    @register_model("crossformer_small")
    def _crossformer(num_classes, image_size, robust, dtype, **kw):
        return _lazy("crossformer", "CrossFormer")(
            num_classes=num_classes, robust=robust, dtype=dtype, **kw,
        )

    @register_model("regionvit_small")
    def _regionvit(num_classes, image_size, robust, dtype, **kw):
        return _lazy("regionvit", "RegionViT")(
            num_classes=num_classes, robust=robust, dtype=dtype, **kw,
        )

    @register_model("scalable_vit_small")
    def _scalable(num_classes, image_size, robust, dtype, **kw):
        return _lazy("scalable_vit", "ScalableViT")(
            num_classes=num_classes, dim=kw.pop("dim", 64),
            depth=kw.pop("depth", (2, 2, 10, 2)),
            heads=kw.pop("heads", (2, 4, 8, 16)),
            reduction_factor=kw.pop("reduction_factor", (8, 4, 2, 1)),
            window_size=kw.pop("window_size", (64, 32, None, None)),
            robust=robust, dtype=dtype, **kw,
        )

    @register_model("sep_vit_small")
    def _sep(num_classes, image_size, robust, dtype, **kw):
        return _lazy("sep_vit", "SepViT")(
            num_classes=num_classes, dim=kw.pop("dim", 32),
            depth=kw.pop("depth", (1, 2, 6, 2)),
            heads=kw.pop("heads", (1, 2, 4, 8)),
            robust=robust, dtype=dtype, **kw,
        )

    @register_model("nest_tiny")
    def _nest(num_classes, image_size, robust, dtype, **kw):
        return _lazy("nest", "NesT")(
            image_size=image_size, patch_size=kw.pop("patch_size", 4),
            num_classes=num_classes, dim=kw.pop("dim", 96),
            heads=kw.pop("heads", 3),
            num_hierarchies=kw.pop("num_hierarchies", 3),
            block_repeats=kw.pop("block_repeats", (2, 2, 8)),
            robust=robust, dtype=dtype, **kw,
        )

    @register_model("mobile_vit_xs")
    def _mobile(num_classes, image_size, robust, dtype, **kw):
        return _lazy("mobile_vit", "MobileViT")(
            image_size=(image_size, image_size),
            dims=kw.pop("dims", (96, 120, 144)),
            channels=kw.pop("channels", (16, 32, 48, 48, 64, 64, 80, 80, 96, 96, 384)),
            num_classes=num_classes, robust=robust, dtype=dtype, **kw,
        )

    @register_model("ats_vit")
    def _ats(num_classes, image_size, robust, dtype, **kw):
        patch = _small_patch(image_size)
        n = (image_size // patch) ** 2
        depth = kw.pop("depth", 6)
        default_tokens = tuple(
            max(4, int(n * (0.8**i))) for i in range(1, depth + 1)
        )
        return _lazy("ats_vit", "ATSViT")(
            image_size=image_size, patch_size=patch, num_classes=num_classes,
            dim=kw.pop("dim", 512), depth=depth,
            max_tokens_per_depth=kw.pop("max_tokens_per_depth", default_tokens),
            heads=kw.pop("heads", 8), mlp_dim=kw.pop("mlp_dim", 1024),
            dtype=dtype, **kw,
        )

    @register_model("local_vit")
    def _local(num_classes, image_size, robust, dtype, **kw):
        return _lazy("local_vit", "LocalViT")(
            image_size=image_size, patch_size=_small_patch(image_size),
            num_classes=num_classes, dim=kw.pop("dim", 512),
            depth=kw.pop("depth", 6), heads=kw.pop("heads", 8),
            mlp_dim=kw.pop("mlp_dim", 1024), robust=robust, dtype=dtype, **kw,
        )

    @register_model("rvt_small")
    def _rvt(num_classes, image_size, robust, dtype, **kw):
        return _lazy("rvt", "RvT")(
            image_size=image_size, patch_size=_small_patch(image_size),
            num_classes=num_classes, dim=kw.pop("dim", 512),
            depth=kw.pop("depth", 6), heads=kw.pop("heads", 8),
            mlp_dim=kw.pop("mlp_dim", 1024), robust=robust, dtype=dtype, **kw,
        )

    @register_model("small_dataset_vit")
    def _sds(num_classes, image_size, robust, dtype, **kw):
        return _lazy("vit_variants", "SmallDatasetViT")(
            image_size=image_size, patch_size=_small_patch(image_size),
            num_classes=num_classes, dim=kw.pop("dim", 512),
            depth=kw.pop("depth", 6), heads=kw.pop("heads", 8),
            mlp_dim=kw.pop("mlp_dim", 1024), robust=robust, dtype=dtype, **kw,
        )


    @register_model("vit")
    def _vit(num_classes, image_size, robust, dtype, **kw):
        patch = kw.pop("patch_size", 4 if image_size <= 64 else 16)
        return ViT(
            image_size=image_size, patch_size=patch, num_classes=num_classes,
            dim=kw.pop("dim", 512), depth=kw.pop("depth", 6),
            heads=kw.pop("heads", 8), mlp_dim=kw.pop("mlp_dim", 1024),
            robust=robust, dtype=dtype, **kw,
        )

    @register_model("deepvit")
    def _deepvit(num_classes, image_size, robust, dtype, **kw):
        patch = kw.pop("patch_size", 4 if image_size <= 64 else 16)
        return DeepViT(
            image_size=image_size, patch_size=patch, num_classes=num_classes,
            dim=kw.pop("dim", 512), depth=kw.pop("depth", 6),
            heads=kw.pop("heads", 8), mlp_dim=kw.pop("mlp_dim", 1024),
            robust=robust, dtype=dtype, **kw,
        )

    @register_model("cait")
    def _cait(num_classes, image_size, robust, dtype, **kw):
        patch = kw.pop("patch_size", 4 if image_size <= 64 else 16)
        return CaiT(
            image_size=image_size, patch_size=patch, num_classes=num_classes,
            dim=kw.pop("dim", 512), depth=kw.pop("depth", 6),
            cls_depth=kw.pop("cls_depth", 2), heads=kw.pop("heads", 8),
            mlp_dim=kw.pop("mlp_dim", 1024), robust=robust, dtype=dtype, **kw,
        )

    @register_model("vit_tiny_test")
    def _vit_tiny_test(num_classes, image_size, robust, dtype, **kw):
        """Minimal ViT for smoke cells (sweep one-cell tests, CI): compiles
        in seconds on CPU at any image size."""
        return SimpleViT(
            image_size=image_size,
            patch_size=kw.pop("patch_size", 8 if image_size <= 64 else 16),
            num_classes=num_classes,
            dim=kw.pop("dim", 32),
            depth=kw.pop("depth", 1),
            heads=kw.pop("heads", 2),
            mlp_dim=kw.pop("mlp_dim", 64),
            robust=robust,
            dtype=dtype,
            **kw,
        )

    @register_model("simple_vit")
    def _simple_vit(num_classes, image_size, robust, dtype, **kw):
        """The CPU-runnable baseline config of BASELINE.json (depth-6/dim-512/
        patch-4 @32px) scaled by image size."""
        patch = kw.pop("patch_size", 4 if image_size <= 64 else 16)
        return SimpleViT(
            image_size=image_size,
            patch_size=patch,
            num_classes=num_classes,
            dim=kw.pop("dim", 512),
            depth=kw.pop("depth", 6),
            heads=kw.pop("heads", 8),
            mlp_dim=kw.pop("mlp_dim", 1024),
            robust=robust,
            dtype=dtype,
            **kw,
        )

    @register_model("simple_vit_b16")
    def _simple_vit_b16(num_classes, image_size, robust, dtype, **kw):
        """SimpleViT-B/16 — the flagship throughput config (BASELINE.json)."""
        return SimpleViT(
            image_size=image_size,
            patch_size=16,
            num_classes=num_classes,
            dim=768,
            depth=12,
            heads=12,
            mlp_dim=3072,
            robust=robust,
            dtype=dtype,
            **kw,
        )


_register_builtins()
