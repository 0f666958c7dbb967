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
from tests._distributed_common import GLOBAL_BATCH, run_one_step  # noqa: E402

pi, pc = init_distributed()
assert pc == 2, f"expected 2 processes, got {pc}"
assert len(jax.devices()) == 8, f"expected 8 global devices, got {len(jax.devices())}"

mesh = global_mesh()
half = GLOBAL_BATCH // 2
sl = slice(pi * half, (pi + 1) * half)


def put(batch):
    return local_batch_to_global(
        {k: v[sl] for k, v in batch.items()}, batch_sharding(mesh)
    )


loss = run_one_step(put)
# init_distributed gates print to rank 0 (the reference's
# setup_for_distributed); force=True overrides so BOTH workers report
print(f"WORKER_LOSS {loss:.8f}", flush=True, force=True)
print("SHOULD_BE_SILENT_ON_RANK1", flush=True)
