"""Model zoo (maps the reference's vit_pytorch_robust/ — SURVEY.md §2.2)."""

from .cait import CaiT
from .deepvit import DeepViT
from .levit import (
    LeViT,
    LeViT_128,
    LeViT_128S,
    LeViT_192,
    LeViT_256,
    LeViT_384,
    fuse_levit_variables,
    levit_flops,
)
from .patch_convnet import B60, B120, L60, L120, S60, S60_multi, S120, PatchConvnet
from .simple_vit import SimpleViT
from .swin import (
    SwinTransformer,
    swin_b,
    swin_s,
    swin_t,
    swin_v2_b,
    swin_v2_s,
    swin_v2_t,
)
from .vision_transformer import (
    VisionTransformer,
    interpolate_embeddings,
    vit_b_16,
    vit_b_32,
    vit_h_14,
    vit_l_16,
    vit_l_32,
)
from .vit import ViT
from .mae import MAE
from .simmim import SimMIM
from .mpp import MPP, mpp_loss
from .dino import Dino, DinoMLP, DinoNet, DinoState, dino_crops, dino_loss
from .es_vit import EsViTNet, EsViTState, EsViTTrainer, region_loss_fn
from .distill import DistillableViT, DistillWrapper
from .recorder import Extractor, Recorder
from .resnet import ResNet, resnet18, resnet34, resnet50, resnet101
from .max_vit import MaxViT
from .t2t import T2TViT
from .pit import PiT
from .cvt import CvT
from .cross_vit import CrossViT
from .cct import CCT, CCT3D, cct_2, cct_4, cct_6, cct_7, cct_8, cct_14, cct_16
from .nest import NesT
from .mobile_vit import MobileViT
from .twins_svt import TwinsSVT
from .ats_vit import ATSViT
from .sep_vit import SepViT
from .crossformer import CrossFormer
from .scalable_vit import ScalableViT
from .regionvit import RegionViT
from .local_vit import LocalViT
from .rvt import RvT
from .vit_variants import (
    Adapter,
    EfficientViT,
    LearnableMemoryViT,
    ParallelViT,
    PatchMerger,
    SimpleViT1D,
    SimpleViT3D,
    SimpleViTWithPatchDropout,
    SmallDatasetViT,
    ViT1D,
    ViT3D,
    ViTWithPatchDropout,
    ViTWithPatchMerger,
    ViViT,
)

__all__ = [
    "MAE",
    "SimMIM",
    "MPP",
    "mpp_loss",
    "Dino",
    "DinoMLP",
    "DinoNet",
    "DinoState",
    "dino_crops",
    "dino_loss",
    "EsViTNet",
    "EsViTState",
    "EsViTTrainer",
    "region_loss_fn",
    "DistillableViT",
    "DistillWrapper",
    "Extractor",
    "Recorder",
    "ResNet",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "MaxViT",
    "T2TViT",
    "PiT",
    "CvT",
    "CrossViT",
    "CCT",
    "CCT3D",
    "cct_2",
    "cct_4",
    "cct_6",
    "cct_7",
    "cct_8",
    "cct_14",
    "cct_16",
    "NesT",
    "MobileViT",
    "TwinsSVT",
    "ATSViT",
    "SepViT",
    "CrossFormer",
    "ScalableViT",
    "RegionViT",
    "LocalViT",
    "RvT",
    "Adapter",
    "EfficientViT",
    "LearnableMemoryViT",
    "ParallelViT",
    "PatchMerger",
    "SimpleViT1D",
    "SimpleViT3D",
    "SimpleViTWithPatchDropout",
    "SmallDatasetViT",
    "ViT1D",
    "ViT3D",
    "ViTWithPatchDropout",
    "ViTWithPatchMerger",
    "ViViT",
    "CaiT",
    "DeepViT",
    "LeViT",
    "LeViT_128",
    "LeViT_128S",
    "LeViT_192",
    "LeViT_256",
    "LeViT_384",
    "fuse_levit_variables",
    "levit_flops",
    "B60",
    "B120",
    "L60",
    "L120",
    "S60",
    "S60_multi",
    "S120",
    "PatchConvnet",
    "SimpleViT",
    "SwinTransformer",
    "swin_b",
    "swin_s",
    "swin_t",
    "swin_v2_b",
    "swin_v2_s",
    "swin_v2_t",
    "VisionTransformer",
    "interpolate_embeddings",
    "vit_b_16",
    "vit_b_32",
    "vit_h_14",
    "vit_l_16",
    "vit_l_32",
    "ViT",
]
