"""Training runtime (the reference's external ``omega`` layer, SURVEY.md §2.4)."""

from .checkpoint import latest_step, restore_checkpoint, save_checkpoint
from .config import make_config, save_hparams
from .data import ArrayDataset, DataLoader, augment_batch, make_loader
from .image_data import (
    ImageFolderDataset,
    ImageFolderLoader,
    PackedDataset,
    pack_image_folder,
)
from .logging import RunLogger, gather_runs
from .optim import adamw, make_optimizer, multistep, warmup_constant_cosine, warmup_cosine
from .trainer import Trainer, TrainState

__all__ = [
    "latest_step",
    "restore_checkpoint",
    "save_checkpoint",
    "make_config",
    "save_hparams",
    "ArrayDataset",
    "DataLoader",
    "augment_batch",
    "make_loader",
    "ImageFolderDataset",
    "ImageFolderLoader",
    "PackedDataset",
    "pack_image_folder",
    "RunLogger",
    "gather_runs",
    "adamw",
    "make_optimizer",
    "multistep",
    "warmup_constant_cosine",
    "warmup_cosine",
    "Trainer",
    "TrainState",
]
