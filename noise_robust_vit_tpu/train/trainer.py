"""Training-loop engine — TPU-native replacement for the external
``omega.Trainer`` the reference's experiments subclass (SURVEY.md §2.4, §3.2).

Hook protocol mirrors the reference call sites (ref examples/CIFAR100.py:16-166,
sup_ssl.py:20-157): subclasses override ``initialize_train_loader/val_loader/
modules/optimizer``, ``compute_loss``, ``eval_step`` and the before/after
hooks; the engine owns the jitted step, the device mesh, checkpointing and
JSON-lines logging.

TPU design (vs the reference's DDP):
  * one `jax.sharding.Mesh` over all chips; batches sharded on the ``data``
    axis, params/optimizer state replicated — XLA inserts the gradient
    all-reduce over ICI (no NCCL plumbing);
  * ``compute_loss`` / ``eval_step`` are PURE functions of (params, state,
    batch, rng) traced once under ``jit``; mutable collections (BN stats)
    travel through explicitly;
  * sync-BN semantics (ref --sync-batchnorm, CIFAR100.py:194) is automatic:
    under jit the norm sees the global batch;
  * checkpoint/resume via Orbax replaces submitit preemption requeue
    (SURVEY.md §5 failure detection).
"""

from __future__ import annotations

import contextlib
import signal
import threading
import time
from typing import Any, Iterable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import unfreeze

from ..parallel import (
    batch_sharding,
    fsdp_param_shardings,
    local_mesh,
    make_mesh,
    replicated,
    tp_param_shardings,
    tp_shardings_active,
)
from ..parallel.tp import DEFAULT_TP_RULES
from .checkpoint import restore_checkpoint, save_checkpoint
from .logging import RunLogger
from .optim import make_optimizer

__all__ = ["Trainer", "TrainState"]


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    model_state: Any  # mutable collections (batch_stats, ...)
    step: jax.Array


class Trainer:
    """Subclass and override the hooks; then ``trainer()`` runs training."""

    def __init__(self, args):
        self.args = args
        self.logger = RunLogger(args.folder)
        self.epoch = 0
        self.mesh = None
        self._parallelism = "dp"
        self.model = None
        self.train_loader: Iterable | None = None
        self.val_loader: Iterable | None = None
        self._buffers: dict[str, Any] = {}
        self.rng = jax.random.PRNGKey(getattr(args, "seed", 0))

    # ------------------------------------------------------------- hooks --
    def initialize_train_loader(self) -> Iterable:
        raise NotImplementedError

    def initialize_val_loader(self) -> Iterable | None:
        return None

    def initialize_modules(self) -> None:
        """Must set ``self.model`` (a flax Module) and may set extra modules."""
        raise NotImplementedError

    def initialize_optimizer(self, total_steps: int) -> optax.GradientTransformation:
        return make_optimizer(self.args, total_steps)

    def compute_loss(self, params, model_state, batch, rng):
        """PURE. Return ``(loss, {"metrics": {...}, "model_state": new_state})``.

        ``model_state`` holds mutable collections; return it (possibly
        updated) under the ``"model_state"`` key, or omit to keep unchanged.
        """
        raise NotImplementedError

    def eval_step(self, params, model_state, batch):
        """PURE. Return a dict of per-batch metric SUMS plus a ``"count"``
        entry; the engine divides at epoch end (matches the distributed
        accuracy reduction of ref CIFAR100.py:148-163)."""
        raise NotImplementedError

    def before_train_epoch(self):
        pass

    def before_eval_epoch(self):
        pass

    def after_eval_epoch(self, metrics: dict):
        self.log_txt("eval_accuracies", epoch=self.epoch, **metrics)

    def after_train_step(self, metrics: dict):
        pass

    # ----------------------------------------------------------- plumbing --
    def log_txt(self, name: str, **scalars):
        self.logger.log_txt(name, **scalars)

    def register_buffer(self, name: str, value):
        self._buffers[name] = value
        setattr(self, name, value)

    def next_rng(self) -> jax.Array:
        self.rng, key = jax.random.split(self.rng)
        return key

    # ------------------------------------------------------------- engine --
    def init_state(self, sample_batch) -> TrainState:
        """Initialize params/model-state from a sample batch and build the
        optimizer. Override ``init_params`` for custom init."""
        variables = unfreeze(self.init_params(sample_batch))
        params = variables.pop("params")
        model_state = variables  # plain dict: consistent pytree containers
        opt_state = self.tx.init(params)
        return TrainState(
            params=params,
            opt_state=opt_state,
            model_state=model_state,
            step=jnp.zeros((), jnp.int32),
        )

    def init_params(self, sample_batch):
        return self.model.init(self.next_rng(), sample_batch["image"])

    def _compute_state_shardings(self, mode: str):
        """NamedSharding pytree for the full TrainState under ``mode``.
        Optimizer moments mirror the param paths, so the path/shape-based
        rules (parallel/tp.py, parallel/fsdp.py) apply to the whole state
        pytree; scalars and small leaves stay replicated."""
        if mode == "dp":
            rep = replicated(self.mesh)
            return jax.tree_util.tree_map(lambda _: rep, self.state)
        if mode == "fsdp":
            return fsdp_param_shardings(self.state, self.mesh)
        if mode == "tp":
            return tp_param_shardings(self.state, self.mesh)
        if mode == "tp_fsdp":
            return fsdp_param_shardings(
                self.state, self.mesh, tp_rules=DEFAULT_TP_RULES
            )
        if mode in ("pp", "dp_pp"):
            from ..parallel.pp import pp_state_shardings

            return pp_state_shardings(self.state, self.mesh)
        raise ValueError(
            f"unknown parallelism {mode!r} (dp | fsdp | tp | tp_fsdp | pp | dp_pp)"
        )

    def _with_mesh_ctx(self, jitted):
        """Call ``jitted`` under the mesh + activation-sharding-constraint
        context for non-DP modes (the constraints stop the GSPMD partitioner
        from round-tripping attention activations through replicated
        layouts — see parallel/tp.py::tp_shardings_active; valid for FSDP
        too, where they pin batch-sharded activations)."""
        if self._parallelism == "dp":
            return jitted
        mesh = self.mesh
        # pp runs the blocks inside shard_map (manual mesh axes), where
        # with_sharding_constraint is invalid — mesh context only there
        tp_ctx = (
            tp_shardings_active
            if self._parallelism not in ("pp", "dp_pp")
            else contextlib.nullcontext
        )

        def call(*a, **k):
            with mesh, tp_ctx(mesh):
                return jitted(*a, **k)

        return call

    def _build_train_step(self):
        tx = self.tx

        def train_step(state: TrainState, batch, rng):
            def loss_fn(params):
                loss, out = self.compute_loss(params, state.model_state, batch, rng)
                return loss, out

            (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = dict(out.get("metrics", {}))
            metrics["loss"] = loss
            new_model_state = unfreeze(out.get("model_state", state.model_state))
            new_state = state.replace(
                params=params,
                opt_state=opt_state,
                model_state=new_model_state,
                step=state.step + 1,
            )
            return new_state, metrics

        return self._with_mesh_ctx(jax.jit(
            train_step,
            in_shardings=(
                self._state_shardings,
                batch_sharding(self.mesh),
                replicated(self.mesh),
            ),
            out_shardings=(self._state_shardings, replicated(self.mesh)),
            donate_argnums=(0,),
        ))

    def _build_eval_step(self):
        def eval_step(state: TrainState, batch):
            return self.eval_step(state.params, state.model_state, batch)

        return self._with_mesh_ctx(jax.jit(
            eval_step,
            in_shardings=(self._state_shardings, batch_sharding(self.mesh)),
            out_shardings=replicated(self.mesh),
        ))

    def _shard_batch(self, batch):
        sharding = batch_sharding(self.mesh)
        if jax.process_count() > 1:
            # multi-host: each process holds its shard of the global batch
            # (loaders shard by process_index — train/data.py::make_loader);
            # assemble the global array from the local slices
            from ..parallel.distributed import local_batch_to_global

            return local_batch_to_global(batch, sharding)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(jnp.asarray(x), sharding), batch
        )

    def _prefetch(self, loader, size: int = 2):
        """Iterate device-resident batches with a ``size``-deep lookahead so
        the next H2D transfer overlaps the current step (device_put is
        async) — the role FFCV's stream overlap played for the reference."""
        import collections

        queue = collections.deque()
        it = iter(loader)
        try:
            for _ in range(size):
                queue.append(self._shard_batch(next(it)))
        except StopIteration:
            pass
        while queue:
            out = queue.popleft()
            try:
                queue.append(self._shard_batch(next(it)))
            except StopIteration:
                pass
            yield out

    def setup(self):
        """Build mesh, loaders, model, optimizer, state, jitted steps."""
        from ..parallel import init_distributed

        # env-driven multi-process init (no-op single process) — the
        # reference's init_distributed_mode role (evaluate_copy_detection.py:
        # 117-150); after this jax.devices() spans every process's chips
        init_distributed()
        mode = getattr(self.args, "parallelism", "dp") or "dp"
        self._parallelism = mode
        if self.mesh is None:
            if mode in ("tp", "tp_fsdp"):
                tp_deg = int(getattr(self.args, "tp_degree", 2) or 2)
                n = len(jax.devices())
                if n % tp_deg:
                    raise ValueError(
                        f"tp_degree {tp_deg} does not divide {n} devices"
                    )
                self.mesh = make_mesh((n // tp_deg, tp_deg), ("data", "model"))
            elif mode in ("pp", "dp_pp"):
                pp_deg = int(getattr(self.args, "pp_degree", 4) or 4)
                n = len(jax.devices())
                if n % pp_deg:
                    raise ValueError(
                        f"pp_degree {pp_deg} does not divide {n} devices"
                    )
                self.mesh = make_mesh((n // pp_deg, pp_deg), ("data", "pipe"))
            else:
                self.mesh = local_mesh()
        self.train_loader = self.initialize_train_loader()
        self.val_loader = self.initialize_val_loader()
        self.initialize_modules()
        if mode in ("pp", "dp_pp"):
            # GPipe over the transformer depth — wrap AFTER the subclass
            # built its model so classification.py etc. stay unchanged
            from ..parallel.pp import PipelinedModel

            if "pipe" not in self.mesh.axis_names:
                raise ValueError(
                    f"--parallelism {mode} needs a mesh with a 'pipe' axis; "
                    f"got {self.mesh.axis_names}"
                )
            self.model = PipelinedModel(self.model, self.mesh)
        steps_per_epoch = len(self.train_loader)
        total_steps = steps_per_epoch * self.args.epochs
        self.tx = self.initialize_optimizer(total_steps)
        sample = next(iter(self.train_loader))
        self.state = self.init_state(sample)
        # place the state over the mesh per --parallelism: 'dp' replicates
        # (the reference's mode); 'fsdp' shards every large leaf (params AND
        # optimizer moments — their paths mirror the params') over data
        # (ZeRO-3); 'tp'/'tp_fsdp' add Megatron column/row kernel shardings
        # over the model axis (parallel/tp.py, parallel/fsdp.py)
        self._state_shardings = self._compute_state_shardings(mode)
        self.state = jax.tree_util.tree_map(
            jax.device_put, self.state, self._state_shardings
        )
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self._steps_per_epoch = steps_per_epoch
        # resume (replaces submitit requeue, SURVEY.md §5)
        restored = restore_checkpoint(self.args.folder, self.state)
        if restored is not None:
            # re-place: restored leaves arrive host-side; the jitted step's
            # in_shardings expect the mode's placement
            self.state = jax.tree_util.tree_map(
                jax.device_put, restored, self._state_shardings
            )
            self.epoch = int(jax.device_get(self.state.step)) // steps_per_epoch
            print(f"resumed from step {int(jax.device_get(self.state.step))}")
        self._install_preemption_handler()

    def _install_preemption_handler(self):
        """SIGTERM/SIGUSR1 → checkpoint at the next step boundary and exit
        143 — the reference's submitit ``slurm_signal_delay_s=120`` grace
        period (ref examples/CIFAR100.py:205); the relauncher then resumes
        losslessly from the saved step."""
        self._preempted = False
        if threading.current_thread() is not threading.main_thread():
            return  # signal.signal only works on the main thread

        def request(signum, frame):
            self._preempted = True

        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                signal.signal(sig, request)
            except (ValueError, OSError):
                pass

    def run_eval(self) -> dict:
        """Evaluation epoch. Batches are prefetched to device (2-deep, same as
        training) and metric sums accumulate as device scalars — ONE host
        sync at the end instead of one per batch (round-1 weak spot: the
        per-batch ``device_get`` serialized H2D transfer and compute)."""
        self.before_eval_epoch()
        totals: dict[str, Any] = {}
        for device_batch in self._prefetch(self.val_loader):
            out = self._eval_step(self.state, device_batch)
            for k, v in out.items():
                totals[k] = v if k not in totals else totals[k] + v
        totals = {k: float(v) for k, v in jax.device_get(totals).items()}
        count = totals.pop("count", 1.0)
        metrics = {k: v / count for k, v in totals.items()}
        self.after_eval_epoch(metrics)
        return metrics

    def __call__(self):
        self.setup()
        args = self.args
        for self.epoch in range(self.epoch, args.epochs):
            self.before_train_epoch()
            if hasattr(self.train_loader, "set_epoch"):
                self.train_loader.set_epoch(self.epoch)
            t0 = time.perf_counter()
            last_metrics = {}
            base_step = int(jax.device_get(self.state.step))
            for i, device_batch in enumerate(self._prefetch(self.train_loader)):
                key = jax.random.fold_in(self.rng, base_step + i)
                self.state, metrics = self._train_step(
                    self.state, device_batch, key
                )
                self.after_train_step(metrics)
                last_metrics = metrics
                if self._preempted:
                    step = int(jax.device_get(self.state.step))
                    save_checkpoint(args.folder, self.state, step)
                    self.log_txt("train_log", epoch=self.epoch, step=step,
                                 preempted=True)
                    print(f"preempted: checkpointed step {step}, exiting")
                    raise SystemExit(143)
            dt = time.perf_counter() - t0
            train_metrics = {
                k: float(jax.device_get(v)) for k, v in last_metrics.items()
            }
            self.log_txt(
                "train_log",
                epoch=self.epoch,
                seconds=dt,
                **train_metrics,
            )
            if self.val_loader is not None and getattr(args, "eval_each_epoch", True):
                self.run_eval()
            freq = getattr(args, "checkpoint_frequency", 0)
            if freq and (self.epoch + 1) % freq == 0:
                save_checkpoint(
                    args.folder, self.state, int(jax.device_get(self.state.step))
                )
        if getattr(args, "save_final_model", False):
            save_checkpoint(
                args.folder, self.state, int(jax.device_get(self.state.step))
            )
        return self.state
