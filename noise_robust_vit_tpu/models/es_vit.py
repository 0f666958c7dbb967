"""EsViT — DINO + region-level matching loss (ref es_vit.py).

Extends DINO with a second objective over PATCH tokens: each student region
is matched to its most-similar teacher region (cosine/dot argmax over the
latents) and the sharpened-CE loss is applied between the matched region
projections (ref es_vit.py:61-78 ``region_loss_fn``). Maintains separate
view and region centers (ref es_vit.py:276-311).

Backbone contract: ``net(x, return_features="tokens")`` returns [B, N, D]
patch-token latents (ViT/SimpleViT provide this; the reference used a
hidden-conv-layer hook, es_vit.py:139-219).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn, struct

from .dino import DinoMLP, dino_crops, dino_loss as view_loss_fn

__all__ = ["EsViTNet", "EsViTState", "region_loss_fn", "EsViTTrainer"]


def region_loss_fn(
    teacher_logits,
    student_logits,
    teacher_latent,
    student_latent,
    teacher_temp,
    student_temp,
    centers,
    eps=1e-20,
):
    """(ref es_vit.py:61-78.) logits [B, N, K]; latents [B, N, D]."""
    teacher_logits = jax.lax.stop_gradient(teacher_logits)
    student_probs = jax.nn.softmax(student_logits / student_temp, axis=-1)
    teacher_probs = jax.nn.softmax(
        (teacher_logits - centers) / teacher_temp, axis=-1
    )
    sim = jnp.einsum("bid,bjd->bij", student_latent, teacher_latent)
    idx = jnp.argmax(sim, axis=-1)  # [B, N] best teacher region per student region
    matched = jnp.take_along_axis(teacher_probs, idx[..., None], axis=1)
    return -jnp.mean(jnp.sum(matched * jnp.log(student_probs + eps), axis=-1))


class EsViTNet(nn.Module):
    """Backbone + view projector + region projector (ref es_vit.py:139-219)."""

    net: nn.Module
    output_dim: int = 65336
    projection_hidden_size: int = 256
    projection_layers: int = 4

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, return_projection: bool = True):
        region_latents = self.net(
            x, deterministic=deterministic, return_features="tokens"
        )  # [B, N, D]
        global_latent = jnp.mean(region_latents, axis=1)
        if not return_projection:
            return global_latent, region_latents
        view_proj = DinoMLP(
            self.output_dim, num_layers=self.projection_layers,
            hidden_size=self.projection_hidden_size, name="view_projector",
        )(global_latent)
        region_proj = DinoMLP(
            self.output_dim, num_layers=self.projection_layers,
            hidden_size=self.projection_hidden_size, name="region_projector",
        )(region_latents)
        return view_proj, region_proj, region_latents


class EsViTState(struct.PyTreeNode):
    student: Any
    teacher: Any
    view_centers: jax.Array
    region_centers: jax.Array
    last_view_centers: jax.Array
    last_region_centers: jax.Array


class EsViTTrainer:
    """(ref es_vit.py:223-367.) Same orchestration shape as models.dino.Dino."""

    def __init__(
        self,
        net: nn.Module,
        image_size: int,
        projection_hidden_size: int = 256,
        num_classes_K: int = 65336,
        projection_layers: int = 4,
        student_temp: float = 0.9,
        teacher_temp: float = 0.04,
        local_upper_crop_scale: float = 0.4,
        global_lower_crop_scale: float = 0.5,
        moving_average_decay: float = 0.9,
        center_moving_average_decay: float = 0.9,
        view_weight: float = 1.0,
        region_weight: float = 1.0,
    ):
        self.wrapper = EsViTNet(
            net, output_dim=num_classes_K,
            projection_hidden_size=projection_hidden_size,
            projection_layers=projection_layers,
        )
        self.image_size = image_size
        self.student_temp = student_temp
        self.teacher_temp = teacher_temp
        self.local_upper = local_upper_crop_scale
        self.global_lower = global_lower_crop_scale
        self.ma_decay = moving_average_decay
        self.center_decay = center_moving_average_decay
        self.num_classes_K = num_classes_K
        self.view_weight = view_weight
        self.region_weight = region_weight

    def init(self, rng, sample_images) -> EsViTState:
        variables = self.wrapper.init(rng, sample_images)
        k = self.num_classes_K
        return EsViTState(
            student=variables["params"],
            teacher=jax.tree_util.tree_map(jnp.array, variables["params"]),
            view_centers=jnp.zeros((1, k)),
            region_centers=jnp.zeros((1, k)),
            last_view_centers=jnp.zeros((1, k)),
            last_region_centers=jnp.zeros((1, k)),
        )

    def loss(self, student_params, state: EsViTState, images, rng):
        k_crop, k_drop = jax.random.split(rng)
        l1, l2, g1, g2 = dino_crops(
            k_crop, images, self.image_size, self.local_upper, self.global_lower
        )
        apply = lambda p, x: self.wrapper.apply(
            {"params": p}, x, deterministic=False, rngs={"dropout": k_drop}
        )
        sv1, sr1, sl1 = apply(student_params, l1)
        sv2, sr2, sl2 = apply(student_params, l2)
        tv1, tr1, tl1 = jax.tree_util.tree_map(
            jax.lax.stop_gradient, apply(state.teacher, g1)
        )
        tv2, tr2, tl2 = jax.tree_util.tree_map(
            jax.lax.stop_gradient, apply(state.teacher, g2)
        )

        new_last_view = jnp.mean(jnp.concatenate([tv1, tv2]), axis=0, keepdims=True)
        new_last_region = jnp.mean(
            jnp.concatenate([tr1, tr2]), axis=(0, 1), keepdims=False
        )[None]

        vloss = (
            view_loss_fn(tv1, sv2, self.teacher_temp, self.student_temp, state.view_centers)
            + view_loss_fn(tv2, sv1, self.teacher_temp, self.student_temp, state.view_centers)
        ) / 2
        rloss = (
            region_loss_fn(tr1, sr2, tl1, sl2, self.teacher_temp, self.student_temp, state.region_centers)
            + region_loss_fn(tr2, sr1, tl2, sl1, self.teacher_temp, self.student_temp, state.region_centers)
        ) / 2
        loss = self.view_weight * vloss + self.region_weight * rloss
        return loss, (new_last_view, new_last_region)

    def update_moving_average(self, state: EsViTState) -> EsViTState:
        beta = self.ma_decay
        teacher = jax.tree_util.tree_map(
            lambda t, s: t * beta + (1 - beta) * s, state.teacher, state.student
        )
        cb = self.center_decay
        return state.replace(
            teacher=teacher,
            view_centers=state.view_centers * cb + (1 - cb) * state.last_view_centers,
            region_centers=state.region_centers * cb + (1 - cb) * state.last_region_centers,
        )
