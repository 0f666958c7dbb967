"""DINO self-distillation, TPU-functional design (ref dino.py).

The reference is stateful PyTorch: forward hooks grab a hidden layer, a
deep-copied teacher is EMA-updated in place, centers are buffers mutated per
step (ref dino.py:120-303). The JAX design makes every piece explicit:

  * ``DinoNet`` — backbone + projector MLP as ONE flax module; the backbone's
    pooled features come from ``return_features=True`` (the functional
    replacement for the hidden-layer hook, ref dino.py:141-172).
  * ``dino_loss`` — temperature-sharpened CE with teacher centering
    (ref dino.py:41-53, algorithm 1 of the paper).
  * ``DinoState`` — student params, teacher params, centers, last-centers as
    a pytree; :func:`update_moving_average` is the reference's per-step EMA
    (ref dino.py:80-84, :305-311 — MUST be called every step).
  * :func:`dino_crops` — the local/global RandomResizedCrop + BYOL augment
    pipeline (ref dino.py:205-222) as one fused device op built on
    ``jax.image.scale_and_translate`` (no host round-trips).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn, struct

from ..ops import gelu

__all__ = [
    "DinoMLP",
    "DinoNet",
    "DinoState",
    "dino_loss",
    "dino_crops",
    "update_moving_average",
    "Dino",
]


class DinoMLP(nn.Module):
    """Projector: (num_layers-1)× Linear+GELU → L2Norm → Linear
    (ref dino.py:93-114)."""

    dim_out: int
    num_layers: int = 4
    hidden_size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden_size, dtype=self.dtype, name=f"fc{i}")(x)
            x = gelu(x)
        norm = jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-6, None)
        x = x / norm
        return nn.Dense(self.dim_out, dtype=self.dtype, name="out")(x)


class DinoNet(nn.Module):
    """Backbone + projector (the reference's NetWrapper, ref dino.py:120-180)."""

    net: nn.Module
    output_dim: int = 65336
    projection_hidden_size: int = 256
    projection_layers: int = 4

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, return_projection: bool = True):
        embed = self.net(x, deterministic=deterministic, return_features=True)
        if not return_projection:
            return embed
        proj = DinoMLP(
            self.output_dim,
            num_layers=self.projection_layers,
            hidden_size=self.projection_hidden_size,
            name="projector",
        )(embed)
        return proj, embed


class DinoState(struct.PyTreeNode):
    student: Any
    teacher: Any
    centers: jax.Array
    last_centers: jax.Array


def dino_loss(
    teacher_logits, student_logits, teacher_temp, student_temp, centers, eps=1e-20
):
    """(ref dino.py:41-53.) The teacher side is stop-gradiented."""
    teacher_logits = jax.lax.stop_gradient(teacher_logits)
    student_probs = jax.nn.softmax(student_logits / student_temp, axis=-1)
    teacher_probs = jax.nn.softmax(
        (teacher_logits - centers) / teacher_temp, axis=-1
    )
    return -jnp.mean(
        jnp.sum(teacher_probs * jnp.log(student_probs + eps), axis=-1)
    )


def update_moving_average(
    state: DinoState,
    moving_average_decay: float = 0.9,
    center_moving_average_decay: float = 0.9,
) -> DinoState:
    """EMA teacher ← student and centers ← last_centers
    (ref dino.py:80-84, :305-311). Call once per training step."""
    beta = moving_average_decay
    teacher = jax.tree_util.tree_map(
        lambda t, s: t * beta + (1 - beta) * s, state.teacher, state.student
    )
    cb = center_moving_average_decay
    centers = state.centers * cb + (1 - cb) * state.last_centers
    return state.replace(teacher=teacher, centers=centers)


def _random_resized_crop(key, img, out_size, scale_range):
    """One random-resized-crop via scale_and_translate (static out shape)."""
    h, w, c = img.shape
    k1, k2, k3 = jax.random.split(key, 3)
    area = jax.random.uniform(k1, (), minval=scale_range[0], maxval=scale_range[1])
    side = jnp.sqrt(area)
    ch, cw = side * h, side * w
    oy = jax.random.uniform(k2, (), maxval=1.0) * (h - ch)
    ox = jax.random.uniform(k3, (), maxval=1.0) * (w - cw)
    scale = jnp.asarray([out_size / ch, out_size / cw])
    translation = -jnp.asarray([oy, ox]) * scale
    return jax.image.scale_and_translate(
        img, (out_size, out_size, c), (0, 1), scale, translation, method="bilinear"
    )


def dino_crops(
    key,
    images,
    image_size: int,
    local_upper_crop_scale: float = 0.4,
    global_lower_crop_scale: float = 0.5,
):
    """Two augmented views → (local₁, local₂, global₁, global₂)
    (ref dino.py:205-222, :276-281). Color jitter/grayscale/flip at BYOL-ish
    strengths, then local crops at scale (0.05, upper) and global crops at
    (lower, 1.0); all device-side."""
    b = images.shape[0]
    k_aug1, k_aug2, kl1, kl2, kg1, kg2 = jax.random.split(key, 6)

    def augment(k, x):
        kj, kg, kf = jax.random.split(k, 3)
        # color jitter (p=0.3-ish strength folded into the jitter magnitude)
        bright = jax.random.uniform(kj, (b, 1, 1, 1), minval=0.6, maxval=1.4)
        x = jnp.clip(x * bright, 0.0, 1.0)
        gray_mask = jax.random.bernoulli(kg, 0.2, (b, 1, 1, 1))
        x = jnp.where(gray_mask, jnp.mean(x, -1, keepdims=True), x)
        flip = jax.random.bernoulli(kf, 0.5, (b, 1, 1, 1))
        return jnp.where(flip, x[:, :, ::-1, :], x)

    one, two = augment(k_aug1, images), augment(k_aug2, images)

    def crops(k, x, scale_range):
        keys = jax.random.split(k, b)
        return jax.vmap(
            lambda kk, img: _random_resized_crop(kk, img, image_size, scale_range)
        )(keys, x)

    return (
        crops(kl1, one, (0.05, local_upper_crop_scale)),
        crops(kl2, two, (0.05, local_upper_crop_scale)),
        crops(kg1, one, (global_lower_crop_scale, 1.0)),
        crops(kg2, two, (global_lower_crop_scale, 1.0)),
    )


class Dino:
    """Orchestration convenience mirroring the reference's ``Dino`` module
    API (ref dino.py:184-303): ``init`` builds student+teacher+centers,
    ``loss`` is the pure training loss on a batch of raw images, and
    ``update_moving_average`` must be called after every optimizer step."""

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
        augment_fn: Callable | None = None,
    ):
        self.wrapper = DinoNet(
            net,
            output_dim=num_classes_K,
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
        self.augment_fn = augment_fn

    def init(self, rng, sample_images) -> DinoState:
        variables = self.wrapper.init(rng, sample_images)
        return DinoState(
            student=variables["params"],
            teacher=jax.tree_util.tree_map(jnp.array, variables["params"]),
            centers=jnp.zeros((1, self.num_classes_K)),
            last_centers=jnp.zeros((1, self.num_classes_K)),
        )

    def loss(self, student_params, state: DinoState, images, rng):
        """Returns (loss, new_last_centers). Differentiate w.r.t.
        ``student_params``; teacher branches are stop-gradiented."""
        k_crop, k_drop = jax.random.split(rng)
        l1, l2, g1, g2 = dino_crops(
            k_crop, images, self.image_size, self.local_upper, self.global_lower
        )
        apply = lambda p, x: self.wrapper.apply(
            {"params": p}, x, deterministic=False, rngs={"dropout": k_drop}
        )[0]
        sp1, sp2 = apply(student_params, l1), apply(student_params, l2)
        tp1 = jax.lax.stop_gradient(apply(state.teacher, g1))
        tp2 = jax.lax.stop_gradient(apply(state.teacher, g2))

        new_last_centers = jnp.mean(
            jnp.concatenate([tp1, tp2], axis=0), axis=0, keepdims=True
        )
        loss = (
            dino_loss(tp1, sp2, self.teacher_temp, self.student_temp, state.centers)
            + dino_loss(tp2, sp1, self.teacher_temp, self.student_temp, state.centers)
        ) / 2
        return loss, new_last_centers

    def update_moving_average(self, state: DinoState) -> DinoState:
        return update_moving_average(state, self.ma_decay, self.center_decay)
