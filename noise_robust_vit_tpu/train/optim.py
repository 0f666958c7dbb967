"""Optimizers and LR schedules (optax), matching the reference's recipes.

The reference uses AdamW with grad clipping (ref examples/CIFAR100.py:90-97,
:196-197) and three LR schedules documented in ref examples/lr_scheduler.py:
13-68: (1) linear warmup → cosine to ``eta_min``; (2) the SequentialLR
variant of the same; (3) warmup → constant → cosine. Plus MultiStepLR for
short DIET runs (ref simpler_randomlabel.py:242-253).
"""

from __future__ import annotations

from typing import Sequence

import optax

__all__ = [
    "warmup_cosine",
    "warmup_constant_cosine",
    "multistep",
    "adamw",
    "make_optimizer",
]


def warmup_cosine(
    base_lr: float,
    total_steps: int,
    warmup_frac: float = 0.1,
    warmup_start_factor: float = 1e-3,
    eta_min_factor: float = 0.05,
) -> optax.Schedule:
    """Linear warmup from ``warmup_start_factor·lr`` over ``warmup_frac`` of
    training, then cosine decay to ``eta_min_factor·lr``
    (ref examples/CIFAR100.py:99-113)."""
    warmup_steps = max(1, int(total_steps * warmup_frac))
    return optax.join_schedules(
        [
            optax.linear_schedule(
                base_lr * warmup_start_factor, base_lr, warmup_steps
            ),
            optax.cosine_decay_schedule(
                base_lr,
                max(1, total_steps - warmup_steps),
                alpha=eta_min_factor,
            ),
        ],
        [warmup_steps],
    )


def warmup_constant_cosine(
    base_lr: float,
    total_steps: int,
    warmup_frac: float = 0.1,
    constant_frac: float = 0.2,
    eta_min_factor: float = 0.05,
) -> optax.Schedule:
    """Warmup → constant plateau → cosine (ref examples/lr_scheduler.py:44-68)."""
    warmup_steps = max(1, int(total_steps * warmup_frac))
    constant_steps = int(total_steps * constant_frac)
    return optax.join_schedules(
        [
            optax.linear_schedule(base_lr * 1e-3, base_lr, warmup_steps),
            optax.constant_schedule(base_lr),
            optax.cosine_decay_schedule(
                base_lr,
                max(1, total_steps - warmup_steps - constant_steps),
                alpha=eta_min_factor,
            ),
        ],
        [warmup_steps, warmup_steps + constant_steps],
    )


def multistep(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float = 0.3,
) -> optax.Schedule:
    """MultiStepLR (ref examples/simpler_randomlabel.py:242-253)."""
    return optax.piecewise_constant_schedule(
        base_lr, {int(m): gamma for m in milestones}
    )


def adamw(
    learning_rate,
    weight_decay: float = 0.05,
    b1: float = 0.9,
    b2: float = 0.999,
    grad_max_norm: float | None = None,
    mask=None,
) -> optax.GradientTransformation:
    """AdamW + optional global-norm clipping (ref examples/CIFAR100.py:90-97;
    clip 5.0 at :196). ``mask`` selects which params get weight decay."""
    tx = optax.adamw(
        learning_rate, b1=b1, b2=b2, weight_decay=weight_decay, mask=mask
    )
    if grad_max_norm:
        tx = optax.chain(optax.clip_by_global_norm(grad_max_norm), tx)
    return tx


def make_optimizer(args, total_steps: int) -> optax.GradientTransformation:
    """Build the optimizer from an omega-style config namespace
    (flags per SURVEY.md §2.4: --learning-rate --weight-decay --beta1 --beta2
    --momentum --grad-max-norm --epochs)."""
    sched_name = getattr(args, "scheduler", "warmup_cosine")
    if sched_name == "multistep":
        milestones = getattr(args, "milestones", None) or [
            int(total_steps * f) for f in (0.5, 0.75, 0.9)
        ]
        schedule = multistep(args.learning_rate, milestones)
    elif sched_name == "warmup_constant_cosine":
        schedule = warmup_constant_cosine(args.learning_rate, total_steps)
    else:
        schedule = warmup_cosine(args.learning_rate, total_steps)

    opt_name = getattr(args, "optimizer", "adamw")
    clip = getattr(args, "grad_max_norm", None)
    if opt_name == "sgd":
        tx = optax.chain(
            optax.add_decayed_weights(args.weight_decay),
            optax.sgd(schedule, momentum=getattr(args, "momentum", 0.9)),
        )
        if clip:
            tx = optax.chain(optax.clip_by_global_norm(clip), tx)
        return tx
    return adamw(
        schedule,
        weight_decay=args.weight_decay,
        b1=getattr(args, "beta1", 0.9),
        b2=getattr(args, "beta2", 0.999),
        grad_max_norm=clip,
    )
