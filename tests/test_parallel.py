"""Parallelism tests on the virtual 8-device mesh: DP semantics, TP param
shardings, profiling utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from noise_robust_vit_tpu import SimpleViT
from noise_robust_vit_tpu.parallel import (
    batch_sharding,
    local_mesh,
    make_mesh,
    shard_params,
    tp_param_shardings,
)


@pytest.fixture(scope="module")
def tiny_model_and_params():
    model = SimpleViT(image_size=16, patch_size=8, num_classes=8, dim=64,
                      depth=2, heads=4, mlp_dim=128, robust=True)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3))
    )["params"]
    return model, params


class TestTP:
    def test_rules_shard_the_right_kernels(self, tiny_model_and_params):
        _, params = tiny_model_and_params
        mesh = make_mesh((4, 2), ("data", "model"))
        sh = tp_param_shardings(params, mesh)
        attn = sh["transformer"]["layers_0_attn"]
        assert attn["to_qkv"]["kernel"].spec == P(None, "model")
        assert attn["to_out"]["kernel"].spec == P("model", None)
        ff = sh["transformer"]["layers_0_ff"]
        assert ff["fc1"]["kernel"].spec == P(None, "model")
        assert ff["fc2"]["kernel"].spec == P("model", None)
        # embeddings / norms replicated
        assert sh["to_patch_embedding"]["proj"]["kernel"].spec == P()
        assert sh["head_norm"]["scale"].spec == P()

    def test_tp_forward_matches_replicated(self, tiny_model_and_params):
        model, params = tiny_model_and_params
        mesh = make_mesh((4, 2), ("data", "model"))
        x = jnp.linspace(0, 1, 8 * 16 * 16 * 3).reshape(8, 16, 16, 3)
        ref = model.apply({"params": params}, x)
        tp_params = shard_params(params, mesh)
        with mesh:
            got = jax.jit(lambda p, x: model.apply({"params": p}, x))(
                tp_params, jax.device_put(x, batch_sharding(mesh))
            )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5
        )

    def test_tp_train_step_runs(self, tiny_model_and_params):
        model, params = tiny_model_and_params
        mesh = make_mesh((4, 2), ("data", "model"))
        tp_params = shard_params(params, mesh)
        tx = optax.adamw(1e-3)
        opt = tx.init(tp_params)
        x = jax.device_put(jnp.ones((8, 16, 16, 3)), batch_sharding(mesh))
        y = jnp.zeros((8,), jnp.int32)

        @jax.jit
        def step(p, o, x, y):
            def lf(p):
                lg = model.apply({"params": p}, x)
                return optax.softmax_cross_entropy_with_integer_labels(
                    lg.astype(jnp.float32), y
                ).mean()

            loss, g = jax.value_and_grad(lf)(p)
            u, o = tx.update(g, o, p)
            return optax.apply_updates(p, u), o, loss

        with mesh:
            p2, _, loss = step(tp_params, opt, x, y)
        assert np.isfinite(float(jax.device_get(loss)))
        # shardings preserved through the update
        k = p2["transformer"]["layers_0_attn"]["to_qkv"]["kernel"]
        assert k.sharding.spec == P(None, "model")

    def test_indivisible_dims_fall_back_to_replication(self):
        mesh = make_mesh((4, 2), ("data", "model"))
        params = {"fc1": {"kernel": jnp.ones((5, 7))}}  # 7 % 2 != 0
        placed = shard_params(params, mesh)
        assert placed["fc1"]["kernel"].sharding.spec == P()


class TestDPSemantics:
    def test_global_batch_stats_under_jit(self):
        """BN under jit DP sees the global batch — the reference's sync-BN."""
        from flax import linen as nn

        mesh = local_mesh()
        bn = nn.BatchNorm(use_running_average=False)
        x = jax.random.normal(jax.random.PRNGKey(0), (16, 4))
        v = bn.init(jax.random.PRNGKey(1), x)
        ref, _ = bn.apply(v, x, mutable=["batch_stats"])
        xs = jax.device_put(x, batch_sharding(mesh))
        got, _ = jax.jit(
            lambda v, x: bn.apply(v, x, mutable=["batch_stats"])
        )(v, xs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


class TestProfiling:
    def test_xla_flops_matmul(self):
        from noise_robust_vit_tpu.utils.profiling import xla_flops

        a = jnp.ones((128, 128))
        flops = xla_flops(lambda a: a @ a, a)
        if flops is not None:  # backend exposes cost analysis
            assert flops >= 2 * 128**3 * 0.9

    def test_summarize_params(self, tiny_model_and_params):
        from noise_robust_vit_tpu.utils.profiling import summarize_params

        _, params = tiny_model_and_params
        s = summarize_params({"params": params})
        assert s["total"] > 0 and "transformer" in s


class TestFSDP:
    def test_large_params_shard_over_data(self, tiny_model_and_params):
        from noise_robust_vit_tpu.parallel import fsdp_param_shardings

        model, params = tiny_model_and_params
        mesh = make_mesh((8,), ("data",))
        sh = fsdp_param_shardings(params, mesh)
        # the MLP fc1 kernel (64×128 = 8192 < threshold) stays replicated;
        # bump to a real-size check on the qkv kernel instead
        flat = jax.tree_util.tree_flatten_with_path(sh)[0]
        specs = {"/".join(getattr(k, "key", str(k)) for k in path): s.spec
                 for path, s in flat}
        # every spec either replicates or shards exactly one dim over 'data'
        for name, spec in specs.items():
            axes = [a for a in spec if a is not None]
            assert axes in ([], ["data"]), (name, spec)

    def test_fsdp_forward_matches_replicated(self, tiny_model_and_params):
        from noise_robust_vit_tpu.parallel import shard_params_fsdp

        model, params = tiny_model_and_params
        mesh = make_mesh((8,), ("data",))
        x = jax.random.normal(jax.random.PRNGKey(1), (16, 16, 16, 3))

        ref = model.apply({"params": params}, x)

        sharded = shard_params_fsdp(params, mesh)
        with mesh:
            got = jax.jit(lambda p, xx: model.apply({"params": p}, xx))(
                sharded, jax.device_put(x, batch_sharding(mesh))
            )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)

    def test_fsdp_train_step_runs_and_keeps_shardings(self, tiny_model_and_params):
        from noise_robust_vit_tpu.parallel import (
            fsdp_param_shardings,
            shard_params_fsdp,
        )

        model, params = tiny_model_and_params
        mesh = make_mesh((8,), ("data",))
        tx = optax.adamw(1e-3)
        sharded = shard_params_fsdp(params, mesh)
        opt_state = tx.init(sharded)
        x = jax.random.normal(jax.random.PRNGKey(1), (16, 16, 16, 3))
        y = jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 8)

        def step(p, s, xx, yy):
            def loss(p):
                lg = model.apply({"params": p}, xx)
                return optax.softmax_cross_entropy_with_integer_labels(lg, yy).mean()

            l, g = jax.value_and_grad(loss)(p)
            u, s = tx.update(g, s, p)
            return optax.apply_updates(p, u), s, l

        with mesh:
            new_p, _, l = jax.jit(step)(
                sharded, opt_state, jax.device_put(x, batch_sharding(mesh)), y
            )
        assert np.isfinite(float(l))
        # params keep their FSDP shardings through the step
        want = fsdp_param_shardings(params, mesh)
        big = [
            (p.sharding.spec, w.spec)
            for p, w in zip(jax.tree_util.tree_leaves(new_p),
                            jax.tree_util.tree_leaves(want))
            if p.size >= 16384
        ]
        assert any(s == w and any(a == "data" for a in w if a) for s, w in big)

    def test_fsdp_composes_with_tp(self, tiny_model_and_params):
        from noise_robust_vit_tpu.parallel import DEFAULT_TP_RULES, fsdp_param_shardings

        model, params = tiny_model_and_params
        mesh = make_mesh((4, 2), ("data", "model"))
        sh = fsdp_param_shardings(params, mesh, tp_rules=DEFAULT_TP_RULES)
        flat = jax.tree_util.tree_flatten_with_path(sh)[0]
        by_name = {"/".join(getattr(k, "key", str(k)) for k in path): s.spec
                   for path, s in flat}
        qkv = [v for k, v in by_name.items() if k.endswith("to_qkv/kernel")]
        assert qkv and all("model" in [a for a in s if a] for s in qkv)
