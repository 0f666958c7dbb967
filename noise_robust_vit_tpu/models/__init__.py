"""Model zoo (maps the reference's vit_pytorch_robust/ — SURVEY.md §2.2)."""

from .simple_vit import SimpleViT

__all__ = ["SimpleViT"]
