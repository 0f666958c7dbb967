"""Pipeline parallelism (parallel/pp.py): exact parity with the sequential
Transformer on a virtual multi-device mesh — forward, gradients, and the
hybrid (data, pipe) 2D mesh. Beyond the reference (DP-only, SURVEY.md §2.5)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from noise_robust_vit_tpu.models.layers import Transformer
from noise_robust_vit_tpu.parallel.pp import (
    pipeline_forward,
    pipeline_shardings,
    stack_layer_params,
)

DIM, DEPTH, HEADS, DIM_HEAD, MLP = 32, 8, 2, 16, 64


def _setup(robust):
    cfg = dict(dim=DIM, depth=DEPTH, heads=HEADS, dim_head=DIM_HEAD,
               mlp_dim=MLP, robust=robust)
    seq = Transformer(**cfg)
    block = Transformer(**{**cfg, "depth": 1})
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 9, DIM))
    params = seq.init(rng, x)["params"]
    stacked, rest = stack_layer_params(params, DEPTH)
    assert rest == {}
    block_apply = lambda p, h: block.apply({"params": p}, h)
    return seq, params, stacked, block_apply, x


@pytest.mark.parametrize("robust", [False, True])
def test_forward_parity(robust):
    seq, params, stacked, block_apply, x = _setup(robust)
    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
    want = seq.apply({"params": params}, x)
    got = jax.jit(
        functools.partial(
            pipeline_forward, mesh=mesh, block_apply=block_apply,
            microbatches=2,
        )
    )(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_forward_parity_sharded_params():
    # params actually placed with the pipe shardings (device k holds stage k)
    seq, params, stacked, block_apply, x = _setup(False)
    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
    placed = jax.device_put(stacked, pipeline_shardings(stacked, mesh))
    want = seq.apply({"params": params}, x)
    got = jax.jit(
        functools.partial(
            pipeline_forward, mesh=mesh, block_apply=block_apply,
            microbatches=4,
        )
    )(placed, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("robust", [False, True])
def test_gradient_parity(robust):
    seq, params, stacked, block_apply, x = _setup(robust)
    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))

    def seq_loss(params):
        return jnp.mean(seq.apply({"params": params}, x) ** 2)

    def pp_loss(stacked):
        out = pipeline_forward(stacked, x, mesh=mesh,
                               block_apply=block_apply, microbatches=2)
        return jnp.mean(out ** 2)

    g_seq = jax.grad(seq_loss)(params)
    g_seq_stacked, _ = stack_layer_params(g_seq, DEPTH)
    g_pp = jax.jit(jax.grad(pp_loss))(stacked)
    flat_a, _ = jax.tree_util.tree_flatten(g_pp)
    flat_b, _ = jax.tree_util.tree_flatten(g_seq_stacked)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5)


def test_hybrid_data_pipe_mesh():
    seq, params, stacked, block_apply, x = _setup(False)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "pipe"))
    want = seq.apply({"params": params}, x)
    got = jax.jit(
        functools.partial(
            pipeline_forward, mesh=mesh, block_apply=block_apply,
            data_axis="data", microbatches=2,
        )
    )(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_bad_microbatch_count():
    _, _, stacked, block_apply, x = _setup(False)
    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_forward(stacked, x, mesh=mesh, block_apply=block_apply,
                         microbatches=3)
