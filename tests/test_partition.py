"""Tensor-parallel partitioning tests (SURVEY.md §2.12: TP as a
sharding-spec change over a ('data','model') mesh, not a rewrite).

Runs on the 8-virtual-device CPU mesh from conftest. The equivalence test
is the acceptance criterion: a dp=2 x tp=4 sharded step produces the same
loss and gradients as the single-device step — XLA's SPMD partitioner
inserts the Megatron all-reduces implied by the partition rules.
"""

import numpy as np
import pytest
import jax

from multi_modal_foundation_model_tpu.parallel import (
    build_mesh, model_axis_size, shard_tree, spec_for, tree_shardings)
from multi_modal_foundation_model_tpu.train import (
    MultiModalTrainer, OptimizerConfig, TrainerConfig)

from test_trainer import tiny_loaders, tiny_model

P = jax.sharding.PartitionSpec


def _mesh_2d(dp=2, tp=4):
    if len(jax.devices()) < dp * tp:
        pytest.skip("needs 8 virtual devices")
    return build_mesh(dp=dp, tp=tp)


def test_build_mesh_axes():
    mesh = _mesh_2d()
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (2, 4)
    assert model_axis_size(mesh) == 4
    dp_only = build_mesh(dp=4, tp=1)
    assert dp_only.axis_names == ("data",)
    assert model_axis_size(dp_only) == 1
    assert model_axis_size(None) == 1


def test_spec_resolution_and_divisibility_fallback():
    mesh = _mesh_2d()
    # column-parallel attention kernel
    assert spec_for("encoder_0/attn/query/kernel", (32, 32), mesh) == \
        P(None, "model")
    # row-parallel projections
    assert spec_for("encoder_0/mlp/down_proj/kernel", (64, 32), mesh) == \
        P("model")
    assert spec_for("decoder_0/cross_attn/out_proj/kernel", (32, 32),
                    mesh) == P("model")
    # stitched tokenizer kernel (S, N, inter): spec left-pads to rank 3
    assert spec_for("encoder_tokenizers_ap/token_embed_kernel", (2, 32, 64),
                    mesh) == P(None, None, "model")
    # non-divisible dim degrades to replication (behavior tokenizer at
    # inter=2*mult when mult*n_channels % tp != 0)
    assert spec_for("encoder_tokenizers_behavior/token_embed/kernel", (2, 6),
                    mesh) == P()
    # norms / embeddings replicated
    assert spec_for("encoder_norm/scale", (32,), mesh) == P()
    assert spec_for("enc_mod_emb_ap/embedding", (2, 32), mesh) == P()


def test_tree_shardings_cover_param_tree():
    mesh = _mesh_2d()
    model = tiny_model(dropout=0.0, embed_dropout=0.0)
    train, _, _ = tiny_loaders(batch_size=16)
    tr = MultiModalTrainer(
        model, train, None, OptimizerConfig(lr=1e-3),
        TrainerConfig(num_epochs=1, log_dir="/tmp/tp_cover", seed=0))
    shardings = tree_shardings(tr.state.params, mesh)
    sharded = [s for s in jax.tree_util.tree_leaves(shardings)
               if s.spec != P()]
    # attention q/k/v + out_proj and MLP kernels must actually shard
    assert len(sharded) >= 10
    # placing the full train state (params + Adam moments + step) works
    state = shard_tree(tr.state, mesh)
    leaf = state.params["encoder_0"]["attn"]["query"]["kernel"]
    assert leaf.sharding.spec == P(None, "model")
    # the Adam moments mirror the param paths, so the same rule shards them
    from jax.tree_util import keystr, tree_flatten_with_path
    mu_leaves = [
        (keystr(path), l)
        for path, l in tree_flatten_with_path(state.opt_state)[0]
        if "mu" in keystr(path) and "attn" in keystr(path)
        and "query" in keystr(path) and "kernel" in keystr(path)]
    assert mu_leaves, "no Adam mu leaf found for attention query kernel"
    assert all(l.sharding.spec == P(None, "model") for _, l in mu_leaves)


def test_tp_matches_single_device(tmp_path):
    """dp=2 x tp=4 loss and gradients equal single-device values."""
    mesh = _mesh_2d()

    def grads(mesh_arg, logdir):
        train, val, _ = tiny_loaders(batch_size=16)
        model = tiny_model(dropout=0.0, embed_dropout=0.0)
        tr = MultiModalTrainer(
            model, train, val,
            OptimizerConfig(lr=1e-3, wd=0.01),
            TrainerConfig(num_epochs=1, log_dir=logdir, seed=0),
            mesh=mesh_arg)
        batch = tr._device_batch(next(iter(tr.train_dataloader)))
        key = jax.random.fold_in(tr.base_key, 0)
        k_mask, _ = jax.random.split(key)

        def loss_fn(params):
            out = tr.model.apply(
                {"params": params}, tr._build_mod_inputs(batch, None),
                training=False, rngs={"mask": k_mask})
            return out.loss

        loss, g = jax.jit(jax.value_and_grad(loss_fn))(tr.state.params)
        return float(loss), jax.device_get(g)

    loss_s, g_s = grads(None, str(tmp_path / "s"))
    loss_t, g_t = grads(mesh, str(tmp_path / "t"))
    assert abs(loss_s - loss_t) < 1e-5 * max(1.0, abs(loss_s))
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_t)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


def test_tp_trainer_epoch_runs(tmp_path):
    """Full trainer epoch (jitted steps + AdamW on the sharded state) over
    dp=2 x tp=4; finite loss, params stay sharded after the update."""
    mesh = _mesh_2d()
    train, val, _ = tiny_loaders(batch_size=16)
    model = tiny_model()
    tr = MultiModalTrainer(
        model, train, val, OptimizerConfig(lr=1e-3, wd=0.01),
        TrainerConfig(num_epochs=1, log_dir=str(tmp_path), seed=0),
        mesh=mesh)
    metrics = tr.train()
    assert np.isfinite(metrics["history"][-1]["train_loss"])
    leaf = tr.state.params["encoder_0"]["attn"]["query"]["kernel"]
    assert leaf.sharding.spec == P(None, "model")


def test_tp_pallas_matches_single_device(tmp_path):
    """The fused Pallas kernel composes with TP via shard_map over the
    'model' axis (heads sharded — ops/attention.py:_flash_mha_tp): a
    dp=2 x tp=2 step reproduces single-device loss and gradients. Runs the
    kernel in interpret mode on the CPU mesh (dropout 0)."""
    mesh = _mesh_2d(dp=2, tp=2)

    def grads(mesh_arg, logdir):
        train, val, _ = tiny_loaders(batch_size=16)
        model = tiny_model(dropout=0.0, embed_dropout=0.0, n_heads=4,
                           attn_impl="pallas")
        tr = MultiModalTrainer(
            model, train, val,
            OptimizerConfig(lr=1e-3, wd=0.01),
            TrainerConfig(num_epochs=1, log_dir=logdir, seed=0),
            mesh=mesh_arg)
        if mesh_arg is not None:
            assert tr._tp_mesh is mesh_arg  # shard_map path engaged
        batch = tr._device_batch(next(iter(tr.train_dataloader)))
        key = jax.random.fold_in(tr.base_key, 0)
        k_mask, _ = jax.random.split(key)

        from multi_modal_foundation_model_tpu.ops.attention import \
            tp_attention

        def loss_fn(params):
            out = tr.model.apply(
                {"params": params}, tr._build_mod_inputs(batch, None),
                training=False, rngs={"mask": k_mask})
            return out.loss

        with tp_attention(mesh_arg):
            loss, g = jax.jit(jax.value_and_grad(loss_fn))(tr.state.params)
        return float(loss), jax.device_get(g)

    loss_s, g_s = grads(None, str(tmp_path / "s"))
    loss_t, g_t = grads(mesh, str(tmp_path / "t"))
    assert abs(loss_s - loss_t) < 1e-5 * max(1.0, abs(loss_s))
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_t)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)


def test_tp_pallas_trainer_epoch_runs(tmp_path):
    """Full jitted trainer epoch with attn_impl='pallas' over dp=2 x tp=2
    (dropout>0 falls back to the oracle inside the kernel dispatch on CPU,
    but the TP context + sharded state path is exercised end to end)."""
    mesh = _mesh_2d(dp=2, tp=2)
    train, val, _ = tiny_loaders(batch_size=16)
    model = tiny_model(n_heads=4, attn_impl="pallas")
    tr = MultiModalTrainer(
        model, train, val, OptimizerConfig(lr=1e-3, wd=0.01),
        TrainerConfig(num_epochs=1, log_dir=str(tmp_path), seed=0),
        mesh=mesh)
    assert tr._tp_mesh is mesh
    metrics = tr.train()
    assert np.isfinite(metrics["history"][-1]["train_loss"])
    leaf = tr.state.params["encoder_0"]["attn"]["query"]["kernel"]
    assert leaf.sharding.spec == P(None, "model")


def test_tp_pallas_heads_not_divisible_falls_back():
    """n_heads % tp != 0: the kernel runs unsharded (XLA handles the
    custom call by replication) instead of crashing."""
    from multi_modal_foundation_model_tpu.ops.attention import \
        _tp_mesh_axis, tp_attention
    mesh = _mesh_2d(dp=2, tp=4)
    with tp_attention(mesh):
        m, a, tp = _tp_mesh_axis(n_heads=2, hidden=32)
        assert tp == 1 and m is None
        m, a, tp = _tp_mesh_axis(n_heads=8, hidden=256)
        assert tp == 4 and a == "model"


def test_tp_dropout_seed_distinct_per_shard():
    """_fold_shard_seed must be injective over every realistic
    (model_idx, data_idx) grid so dp x tp shards draw decorrelated
    attention-dropout masks (reviewed defect: the data-axis index was
    once omitted, giving batch shards bit-identical masks)."""
    import jax.numpy as jnp

    from multi_modal_foundation_model_tpu.ops.attention import \
        _fold_shard_seed
    seed = jnp.asarray(1234, jnp.int32)
    seen = set()
    for model_idx in range(8):
        for data_idx in range(64):
            s = int(_fold_shard_seed(seed, jnp.asarray(model_idx),
                                     jnp.asarray(data_idx)))
            seen.add(s)
    assert len(seen) == 8 * 64
    # data=None (tp-only mesh) still decorrelates the model axis
    only_model = {int(_fold_shard_seed(seed, jnp.asarray(i), None))
                  for i in range(8)}
    assert len(only_model) == 8
