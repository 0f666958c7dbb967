"""L0 compute ops for the TPU-native noise-robust ViT framework.

Pure-JAX reference implementations with Pallas fast paths; maps the
reference's ops layer (ref vit_pytorch_robust/utils.py — SURVEY.md §2.1)."""

from .activations import gelu
from .attention import (
    attention_weights,
    biased_attention,
    biased_dispatch,
    dot_product_attention,
    packed_attention,
    packed_dispatch,
    set_use_pallas,
    streaming_attention,
    streaming_dispatch,
    use_pallas_default,
)
from .posemb import (
    posemb_sincos_1d,
    posemb_sincos_2d,
    posemb_sincos_3d,
    resize_posemb_grid,
)
from .regularizers import cutmix, drop_path, patch_dropout_indices, rand_bbox
from .sinkhorn import (
    robust_softmax,
    sinkhorn_attention,
    sinkhorn_normalize,
    talking_heads_robust_softmax,
)

__all__ = [
    "gelu",
    "attention_weights",
    "biased_attention",
    "biased_dispatch",
    "dot_product_attention",
    "packed_attention",
    "packed_dispatch",
    "set_use_pallas",
    "streaming_attention",
    "streaming_dispatch",
    "use_pallas_default",
    "posemb_sincos_1d",
    "posemb_sincos_2d",
    "posemb_sincos_3d",
    "resize_posemb_grid",
    "cutmix",
    "drop_path",
    "patch_dropout_indices",
    "rand_bbox",
    "robust_softmax",
    "sinkhorn_attention",
    "talking_heads_robust_softmax",
    "sinkhorn_normalize",
]
