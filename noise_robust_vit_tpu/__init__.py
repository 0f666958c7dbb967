"""noise_robust_vit_tpu — TPU-native rebuild of RandallBalestriero/noise-robust-vit.

A from-scratch JAX/XLA/Pallas framework with the reference's capabilities:
the vit-pytorch model zoo with Sinkhorn ("robust") attention, a data-parallel
training runtime over a `jax.sharding.Mesh`, and the noise-robustness
experiment harness. See SURVEY.md for the blueprint.
"""

from . import datasets, models, ops, parallel, train, utils
from .models import SimpleViT

__version__ = "0.1.0"

__all__ = [
    "datasets",
    "models",
    "ops",
    "parallel",
    "train",
    "utils",
    "SimpleViT",
    "__version__",
]
