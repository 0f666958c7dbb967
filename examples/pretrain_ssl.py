"""SSL pretraining driver: MAE / SimMIM / MPP / DINO (BASELINE.json config 5).

The reconstruction objectives (MAE ref mae.py, SimMIM ref simmim.py, MPP ref
mpp.py) wrap a lucidrains-style ViT; DINO (ref dino.py) maintains an EMA
teacher + centers updated after every optimizer step (ref dino.py:261-266).

Usage:
  python examples/pretrain_ssl.py --method mae --architecture vit \
      --dataset CIFAR100 --epochs 100
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax

from noise_robust_vit_tpu import datasets, models
from noise_robust_vit_tpu.parallel import batch_sharding, local_mesh, replicated
from noise_robust_vit_tpu.train import (
    make_loader,
    RunLogger,
    make_config,
    make_optimizer,
    save_checkpoint,
)
from noise_robust_vit_tpu.train.data import augment_batch


def build_vit(args, num_classes, image_size):
    return models.ViT(
        image_size=image_size, patch_size=args.patch_size,
        num_classes=num_classes, dim=args.dim, depth=args.depth,
        heads=args.heads, mlp_dim=args.mlp_dim, robust=args.robust,
    )


def main(args):
    num_classes, image_size = datasets.NAME_TO_CLASS.get(args.dataset, (100, 32))
    ds = datasets.get_dataset(args.dataset_path, "train", name=args.dataset)
    loader = make_loader(ds, args.batch_size, train=True,
                         image_size=image_size, seed=args.seed)
    logger = RunLogger(args.folder)
    mesh = local_mesh()
    rng = jax.random.PRNGKey(args.seed)
    vit = build_vit(args, num_classes, image_size)
    tx = make_optimizer(args, len(loader) * args.epochs)

    sample = jnp.zeros((2, image_size, image_size, 3), jnp.float32)

    if args.method == "esvit":
        es = models.EsViTTrainer(vit, image_size=image_size, num_classes_K=args.dino_k)
        state = es.init(rng, sample)
        opt_state = tx.init(state.student)

        @jax.jit
        def estep(state, opt_state, images, key):
            (loss, (lv, lr)), grads = jax.value_and_grad(
                es.loss, has_aux=True
            )(state.student, state, images, key)
            updates, opt_state = tx.update(grads, opt_state, state.student)
            student = optax.apply_updates(state.student, updates)
            state = state.replace(
                student=student, last_view_centers=lv, last_region_centers=lr
            )
            state = es.update_moving_average(state)
            return state, opt_state, loss

        run_state = (state, opt_state)

        def train_step(run_state, images, key):
            state, opt_state = run_state
            state, opt_state, loss = estep(state, opt_state, images, key)
            return (state, opt_state), loss

        params_for_ckpt = lambda rs: rs[0].student
    elif args.method == "dino":
        dino = models.Dino(vit, image_size=image_size, num_classes_K=args.dino_k)
        state = dino.init(rng, sample)
        opt_state = tx.init(state.student)

        @jax.jit
        def step(state, opt_state, images, key):
            (loss, new_last), grads = jax.value_and_grad(
                dino.loss, has_aux=True
            )(state.student, state, images, key)
            updates, opt_state = tx.update(grads, opt_state, state.student)
            student = optax.apply_updates(state.student, updates)
            state = state.replace(student=student, last_centers=new_last)
            state = dino.update_moving_average(state)
            return state, opt_state, loss

        run_state = (state, opt_state)

        def train_step(run_state, images, key):
            state, opt_state = run_state
            state, opt_state, loss = step(state, opt_state, images, key)
            return (state, opt_state), loss

        params_for_ckpt = lambda rs: rs[0].student
    else:
        if args.method == "mae":
            wrapper = models.MAE(encoder=vit, decoder_dim=args.decoder_dim,
                                 masking_ratio=args.masking_ratio,
                                 decoder_depth=args.decoder_depth)
        elif args.method == "simmim":
            wrapper = models.SimMIM(encoder=vit, masking_ratio=args.masking_ratio)
        elif args.method == "mpp":
            wrapper = models.MPP(transformer=vit, patch_size=args.patch_size,
                                 dim=args.dim)
        else:
            raise ValueError(f"unknown method {args.method}")
        variables = wrapper.init({"params": rng, "mask": rng}, sample)
        params = variables["params"]
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state, images, key):
            def loss_fn(p):
                return wrapper.apply(
                    {"params": p}, images, deterministic=False,
                    rngs={"mask": key, "dropout": key},
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        run_state = (params, opt_state)

        def train_step(run_state, images, key):
            params, opt_state = run_state
            params, opt_state, loss = step(params, opt_state, images, key)
            return (params, opt_state), loss

        params_for_ckpt = lambda rs: rs[0]

    sharding = batch_sharding(mesh)
    step_count = 0
    for epoch in range(args.epochs):
        loader.set_epoch(epoch)
        t0 = time.perf_counter()
        loss = None
        for batch in loader:
            images = jax.device_put(
                augment_batch(
                    jax.random.fold_in(rng, step_count), jnp.asarray(batch["image"]),
                    strength=args.strength, train=True,
                ),
                sharding,
            )
            key = jax.random.fold_in(rng, 10_000_019 + step_count)
            run_state, loss = train_step(run_state, images, key)
            step_count += 1
        logger.log_txt(
            "train_log", epoch=epoch,
            loss=float(jax.device_get(loss)),
            seconds=time.perf_counter() - t0,
        )
        if args.checkpoint_frequency and (epoch + 1) % args.checkpoint_frequency == 0:
            save_checkpoint(args.folder, params_for_ckpt(run_state), step_count)
    if args.save_final_model:
        save_checkpoint(args.folder, params_for_ckpt(run_state), step_count)
    return run_state


def build_parser():
    parser = argparse.ArgumentParser(description="SSL pretraining")
    parser.add_argument("--method", type=str, default="mae",
                        choices=["mae", "simmim", "mpp", "dino", "esvit"])
    parser.add_argument("--dataset", type=str, default="CIFAR100")
    parser.add_argument("--robust", type=lambda v: str(v).lower() in ("1", "true"),
                        default=False)
    parser.add_argument("--strength", type=int, default=0)
    parser.add_argument("--patch-size", type=int, default=4)
    parser.add_argument("--dim", type=int, default=512)
    parser.add_argument("--depth", type=int, default=6)
    parser.add_argument("--heads", type=int, default=8)
    parser.add_argument("--mlp-dim", type=int, default=1024)
    parser.add_argument("--decoder-dim", type=int, default=256)
    parser.add_argument("--decoder-depth", type=int, default=2)
    parser.add_argument("--masking-ratio", type=float, default=0.75)
    parser.add_argument("--dino-k", type=int, default=4096)
    return parser


if __name__ == "__main__":
    args = make_config(build_parser())
    main(args)
