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
