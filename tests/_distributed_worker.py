"""Standalone 2-process jax.distributed worker (driven by
test_distributed.py): initializes the coordination service, builds a global
8-device CPU mesh (2 processes × 4 virtual devices), runs ONE deterministic
DP train step with per-process batch shards, prints the loss."""

import os
import sys

rank = int(sys.argv[1])
port = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["COORDINATOR_ADDRESS"] = f"localhost:{port}"
os.environ["NUM_PROCESSES"] = "2"
os.environ["PROCESS_ID"] = str(rank)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from noise_robust_vit_tpu.parallel import (  # noqa: E402
    batch_sharding,
    global_mesh,
    init_distributed,
    local_batch_to_global,
)
from tests._distributed_common import (  # noqa: E402
    GLOBAL_BATCH,
    run_one_step,
    run_one_step_jpeg,
)

jpeg_tree = sys.argv[3] if len(sys.argv) > 3 else None

pi, pc = init_distributed()
assert pc == 2, f"expected 2 processes, got {pc}"
assert len(jax.devices()) == 8, f"expected 8 global devices, got {len(jax.devices())}"

mesh = global_mesh()


def put_global(batch):
    """Local per-process shard → globally-sharded arrays."""
    return local_batch_to_global(batch, batch_sharding(mesh))


if jpeg_tree is not None:
    # per-process loader shard over a real JPEG tree (the reference's FFCV
    # world_size sharding, ref randomlabel.py:72-77)
    loss = run_one_step_jpeg(
        jpeg_tree, shard=(pi, pc), batch_size=GLOBAL_BATCH // 2,
        put_batch=put_global,
    )
else:
    half = GLOBAL_BATCH // 2
    sl = slice(pi * half, (pi + 1) * half)
    loss = run_one_step(
        lambda batch: put_global({k: v[sl] for k, v in batch.items()})
    )
# init_distributed gates print to rank 0 (the reference's
# setup_for_distributed); force=True overrides so BOTH workers report
print(f"WORKER_LOSS {loss:.8f}", flush=True, force=True)
print("SHOULD_BE_SILENT_ON_RANK1", flush=True)
