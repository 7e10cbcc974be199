"""Model-level tests: MultiModal forward semantics, baselines, init scaling.

SURVEY.md §4.2: token concat order, batch-uniform masking, loss
normalization (sum mod losses / sum masked counts), shared modality
embeddings, fixup init.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_foundation_model_tpu.models import (
    BaselineDecoder,
    BaselineEncoder,
    ModalityInput,
    MultiModal,
    MultiModalConfig,
    RegionLookup,
)
from multi_modal_foundation_model_tpu.ops import MaskParams, RegionSets

B, T, N_AP, N_BEH = 3, 10, 16, 2


def tiny_config(**over):
    defaults = dict(
        n_channels={"ap": N_AP, "behavior": N_BEH},
        max_F=T,
        hidden_size=32,
        n_enc_layers=2,
        n_dec_layers=2,
        n_heads=4,
        inter_size=64,
        dropout=0.0,
        embed_dropout=0.0,
        mask_params=MaskParams(ratio=0.3),
        attn_impl="xla",
    )
    defaults.update(over)
    return MultiModalConfig(**defaults)


def make_inputs(rng, eval_mask_ap=None, eval_mask_beh=None):
    spikes = jnp.asarray(rng.poisson(1.0, (B, T, N_AP)).astype(np.float32))
    beh = jnp.asarray(rng.normal(size=(B, T, N_BEH)).astype(np.float32))
    attn = jnp.ones((B, T), jnp.int32)
    ts = jnp.tile(jnp.arange(T), (B, 1))
    return {
        "ap": ModalityInput(inputs=spikes, targets=spikes, attn_mask=attn,
                            timestamps=ts, eval_mask=eval_mask_ap),
        "behavior": ModalityInput(inputs=beh, targets=beh, attn_mask=attn,
                                  timestamps=ts, eval_mask=eval_mask_beh),
    }


@pytest.fixture
def model_and_params(rng):
    cfg = tiny_config()
    model = MultiModal(cfg)
    inputs = make_inputs(rng)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        inputs, training=False)
    return model, params, inputs


def test_forward_shapes_and_finite(model_and_params):
    model, params, inputs = model_and_params
    out = model.apply(params, inputs, rngs={"mask": jax.random.PRNGKey(2)})
    assert out.mod_preds["ap"].shape == (B, T, N_AP)
    assert out.mod_preds["behavior"].shape == (B, T, N_BEH)
    assert np.isfinite(float(out.loss))
    assert float(out.loss) > 0


def test_loss_normalization(model_and_params):
    """loss == sum(mod losses) / sum(masked counts) — mm.py:237."""
    model, params, inputs = model_and_params
    out = model.apply(params, inputs, rngs={"mask": jax.random.PRNGKey(3)})
    total = sum(float(v) for v in out.mod_loss.values())
    n = sum(float(v) for v in out.mod_n_examples.values())
    assert np.isclose(float(out.loss), total / n, rtol=1e-6)


def test_eval_mask_controls_loss_targets(model_and_params, rng):
    """encoding objective: all-spikes eval mask -> behavior loss weight 0."""
    model, params, _ = model_and_params
    inputs = make_inputs(
        rng,
        eval_mask_ap=jnp.ones((B, T, N_AP), jnp.int32),
        eval_mask_beh=jnp.zeros((B, T, N_BEH), jnp.int32))
    out = model.apply(params, inputs, rngs={"mask": jax.random.PRNGKey(4)})
    assert float(out.mod_n_examples["behavior"]) == 0.0
    assert float(out.mod_n_examples["ap"]) == B * T * N_AP


def test_masking_mode_produces_spike_mask_loss(model_and_params, rng):
    model, params, _ = model_and_params
    inputs = make_inputs(rng)
    out = model.apply(params, inputs, masking_mode="temporal",
                      training=False,
                      rngs={"mask": jax.random.PRNGKey(5)})
    # element mask from sampled temporal mask: multiple of full channels
    n_ap = float(out.mod_n_examples["ap"])
    assert n_ap > 0 and n_ap % N_AP == 0


def test_mtm_traced_mode_id(model_and_params, rng):
    model, params, _ = model_and_params
    inputs = make_inputs(rng)
    region_ids = np.repeat(np.arange(4, dtype=np.int32), N_AP // 4)
    regions = RegionSets.build(region_ids)
    modes = ("temporal", "neuron", "inter-region", "intra-region")

    @jax.jit
    def forward(params, mode_id, key):
        return model.apply(params, inputs, masking_mode=mode_id,
                           mtm_modes=modes, regions=regions,
                           rngs={"mask": key}).loss

    losses = [float(forward(params, jnp.int32(i), jax.random.PRNGKey(6)))
              for i in range(len(modes))]
    assert all(np.isfinite(l) for l in losses)


def test_batch_uniform_token_zeroing(model_and_params, rng):
    """Tokens masked by element 0 are zeroed for ALL elements: perturbing a
    masked timestep of any trial's spikes must not change the encoder
    context for other trials (mm.py:147-149)."""
    model, params, _ = model_and_params
    mask_ap = jnp.zeros((B, T, N_AP), jnp.int32).at[:, 3, :].set(1)
    mask_beh = jnp.zeros((B, T, N_BEH), jnp.int32)
    inputs = make_inputs(rng, eval_mask_ap=mask_ap, eval_mask_beh=mask_beh)
    out1 = model.apply(params, inputs, rngs={"mask": jax.random.PRNGKey(7)})

    # change spikes only at the masked timestep of trial 1 — inputs to the
    # transformer are zeroed there, so predictions must be identical
    spikes2 = inputs["ap"].inputs.at[1, 3, :].add(100.0)
    inputs2 = dict(inputs)
    inputs2["ap"] = ModalityInput(
        inputs=spikes2, targets=inputs["ap"].targets,
        attn_mask=inputs["ap"].attn_mask,
        timestamps=inputs["ap"].timestamps, eval_mask=mask_ap)
    out2 = model.apply(params, inputs2, rngs={"mask": jax.random.PRNGKey(7)})
    np.testing.assert_allclose(np.asarray(out1.mod_preds["ap"]),
                               np.asarray(out2.mod_preds["ap"]),
                               atol=1e-5)


def test_shared_modality_embeddings():
    cfg = tiny_config(share_modality_embeddings=True)
    model = MultiModal(cfg)
    rng = np.random.default_rng(0)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        make_inputs(rng), training=False)
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = {"/".join(str(p) for p in path) for path, _ in flat}
    # only the encoder tables exist when shared
    assert any("enc_mod_emb_ap" in n for n in names)
    assert not any("dec_mod_emb_ap" in n for n in names)

    cfg2 = tiny_config(share_modality_embeddings=False)
    params2 = MultiModal(cfg2).init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        make_inputs(rng), training=False)
    names2 = {"/".join(str(p) for p in path)
              for path, _ in jax.tree_util.tree_leaves_with_path(params2)}
    assert any("dec_mod_emb_ap" in n for n in names2)


def test_fixup_init_scaling():
    """out_proj kernels must be ~fixup-factor smaller than query kernels."""
    cfg = tiny_config(fixup_init=True, n_enc_layers=4)
    rng = np.random.default_rng(0)
    params = MultiModal(cfg).init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        make_inputs(rng), training=False)["params"]
    enc0 = params["encoder_0"]["attn"]
    q_std = float(np.std(enc0["query"]["kernel"]))
    o_std = float(np.std(enc0["out_proj"]["kernel"]))
    v_std = float(np.std(enc0["value"]["kernel"]))
    factor = 0.67 * 4 ** (-0.25)
    assert abs(o_std / q_std - factor) < 0.1
    assert abs(v_std / q_std - factor * np.sqrt(2)) < 0.15


def test_grad_flows(model_and_params, rng):
    model, params, inputs = model_and_params

    def loss_fn(p):
        return model.apply(p, inputs, training=False,
                           rngs={"mask": jax.random.PRNGKey(8)}).loss

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(float(np.abs(np.asarray(l)).max()) > 0 for l in leaves)


def test_baseline_encoder(rng):
    beh = jnp.asarray(rng.normal(size=(B, T, N_BEH)).astype(np.float32))
    spikes = jnp.asarray(rng.poisson(1.0, (B, T, N_AP)).astype(np.float32))
    model = BaselineEncoder(in_channel=N_BEH, out_channel=N_AP, seq_len=T)
    params = model.init(jax.random.PRNGKey(0),
                        {"inputs": beh, "targets": spikes})
    out = model.apply(params, {"inputs": beh, "targets": spikes})
    assert out.preds.shape == (B, T, N_AP)
    assert np.isfinite(float(out.loss))
    # poisson nll normalized by batch size
    log_rates = np.asarray(out.preds, np.float64)
    expected = (np.exp(log_rates) - np.asarray(spikes) * log_rates).sum() / B
    assert np.isclose(float(out.loss), expected, rtol=1e-4)


def test_baseline_decoder(rng):
    spikes = jnp.asarray(rng.poisson(1.0, (B, T, N_AP)).astype(np.float32))
    beh = jnp.asarray(rng.normal(size=(B, T, N_BEH)).astype(np.float32))
    model = BaselineDecoder(in_channel=N_AP, out_channel=N_BEH)
    params = model.init(jax.random.PRNGKey(0),
                        {"inputs": spikes, "targets": beh})
    out = model.apply(params, {"inputs": spikes, "targets": beh})
    assert out.preds.shape == (B, T, N_BEH)
    expected = np.square(np.asarray(out.preds) - np.asarray(beh)).sum() / B
    assert np.isclose(float(out.loss), expected, rtol=1e-5)


def test_region_lookup_roundtrip():
    lut = RegionLookup()
    regions = np.array([["CA1", "DG", "nan"], ["DG", "CA1", "LP"]])
    ids = lut(regions)
    assert ids.shape == regions.shape
    assert ids[0, 2] == -1
    assert ids[0, 0] == ids[1, 1]  # same acronym, same id
    back = lut.lookup_regions(ids[:, :2])
    np.testing.assert_array_equal(back, regions[:, :2])


def test_mod_loss_weights():
    """Weighted per-modality-mean loss vs reference-parity normalization."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from multi_modal_foundation_model_tpu.models.multimodal import (
        ModalityInput, MultiModal, MultiModalConfig)
    from multi_modal_foundation_model_tpu.ops.masking import MaskParams

    B, T, N = 2, 10, 8
    base = MultiModalConfig(
        n_channels={"ap": N, "behavior": 2}, max_F=T, hidden_size=16,
        n_enc_layers=1, n_dec_layers=1, n_heads=2, inter_size=32,
        dropout=0.0, embed_dropout=0.0, mask_params=MaskParams(ratio=0.3),
        attn_impl="xla")
    rng = np.random.default_rng(0)
    spikes = jnp.asarray(rng.poisson(0.5, (B, T, N)).astype(np.float32))
    beh = jnp.asarray(rng.normal(size=(B, T, 2)).astype(np.float32))
    attn = jnp.ones((B, T), jnp.int32)
    ts = jnp.tile(jnp.arange(T), (B, 1))
    mi = {"ap": ModalityInput(spikes, spikes, attn, ts,
                              jnp.ones((B, T, N), jnp.int32)),
          "behavior": ModalityInput(beh, beh, attn, ts,
                                    jnp.ones((B, T, 2), jnp.int32))}

    m0 = MultiModal(base)
    params = m0.init({"params": jax.random.PRNGKey(0)}, mi,
                     training=False)["params"]
    out0 = m0.apply({"params": params}, mi, training=False)
    # parity: sum(loss)/sum(n)
    expect0 = ((out0.mod_loss["ap"] + out0.mod_loss["behavior"])
               / (out0.mod_n_examples["ap"] + out0.mod_n_examples["behavior"]))
    np.testing.assert_allclose(float(out0.loss), float(expect0), rtol=1e-6)

    m1 = MultiModal(dataclasses.replace(
        base, mod_loss_weights={"ap": 1.0, "behavior": 5.0}))
    out1 = m1.apply({"params": params}, mi, training=False)
    expect1 = (out1.mod_loss["ap"] / out1.mod_n_examples["ap"]
               + 5.0 * out1.mod_loss["behavior"]
               / out1.mod_n_examples["behavior"])
    np.testing.assert_allclose(float(out1.loss), float(expect1), rtol=1e-6)


def test_qkv_fusion_matches_separate_dense(model_and_params, monkeypatch):
    """The apply-time QKV wide-GEMM fusion (models/layers.py:_fused_proj)
    matches separate Dense projections and leaves the param tree
    unchanged. The unfused path is reached by forcing tp_mesh_active()
    True (its only role in layers.py is disabling the fusion). On TPU
    the match is bit-exact (MXU column accumulation is independent of
    GEMM width; measured loss diff 0.0 on hardware — RESULTS.md); CPU
    BLAS blocking varies with N, so here we allow ~1 ulp."""
    from multi_modal_foundation_model_tpu.models import layers

    model, params, inputs = model_and_params
    rngs = {"mask": jax.random.PRNGKey(2)}
    out_fused = model.apply(params, inputs, rngs=rngs)

    monkeypatch.setattr(layers, "tp_mesh_active", lambda: True)
    params2 = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        inputs, training=False)
    # identical param trees (paths AND values): _ProjParams owns
    # kernel/bias at the same paths/init as the nn.Dense it replaces
    jax.tree.map(np.testing.assert_array_equal, params, params2)
    out_unfused = model.apply(params, inputs, rngs=rngs)

    np.testing.assert_allclose(np.asarray(out_fused.loss),
                               np.asarray(out_unfused.loss), rtol=1e-6)
    for mod in ("ap", "behavior"):
        np.testing.assert_allclose(np.asarray(out_fused.mod_preds[mod]),
                                   np.asarray(out_unfused.mod_preds[mod]),
                                   rtol=1e-5, atol=1e-6)


def test_mxu_embed_matches_nn_embed():
    """MXUEmbed: forward bit-identical to nn.Embed (same gather, same
    param tree); gradient equals the scatter-add VJP up to f32
    accumulation reorder (the backward is a one-hot-transpose GEMM at
    HIGHEST precision — the TPU-native replacement for the 262 us/table
    scatter-adds the device trace exposed, RESULTS.md round 3)."""
    import flax.linen as nn

    from multi_modal_foundation_model_tpu.models.layers import MXUEmbed

    init = nn.initializers.normal(1.0)
    ref, new = (cls(100, 64, embedding_init=init)
                for cls in (nn.Embed, MXUEmbed))
    ids = jax.random.randint(jax.random.PRNGKey(1), (16, 50), 0, 100)
    p_ref = ref.init(jax.random.PRNGKey(0), ids)
    p_new = new.init(jax.random.PRNGKey(0), ids)
    np.testing.assert_array_equal(p_ref["params"]["embedding"],
                                  p_new["params"]["embedding"])

    def loss(params, mod):
        out = mod.apply(params, ids)
        return jnp.sum(jnp.sin(out) * jnp.cos(0.5 * out))

    l_ref, g_ref = jax.value_and_grad(loss)(p_ref, ref)
    l_new, g_new = jax.value_and_grad(loss)(p_new, new)
    assert float(l_ref) == float(l_new)
    np.testing.assert_allclose(g_new["params"]["embedding"],
                               g_ref["params"]["embedding"],
                               rtol=0, atol=1e-4)
    # scalar-id path (session embedding)
    sid = jnp.asarray(3, jnp.int32)
    gs_new = jax.grad(lambda p: jnp.sum(new.apply(p, sid) ** 2))(p_new)
    gs_ref = jax.grad(lambda p: jnp.sum(ref.apply(p, sid) ** 2))(p_ref)
    np.testing.assert_allclose(gs_new["params"]["embedding"],
                               gs_ref["params"]["embedding"],
                               rtol=0, atol=1e-5)


def test_mxu_bias_grad_matches_dense(monkeypatch):
    """MXU_BIAS_GRAD switch (models/layers.py): MXUDense's custom-VJP path
    (db rides the dW GEMM as a ones-row contraction) must match the
    default autodiff path — forward and dx/dW bit-identical (same dots),
    db to f32 accumulation-order noise. The switch is default-off
    (measured net-negative at B=256, see layers.py), but the equivalence
    is pinned so the experiment stays one flag-flip away."""
    import flax.linen as nn

    from multi_modal_foundation_model_tpu.models import layers

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 10, 24))
    mod = layers.MXUDense(16)
    params = mod.init(jax.random.PRNGKey(1), x)
    # param tree mirrors nn.Dense exactly (paths and init)
    ref = nn.Dense(16).init(jax.random.PRNGKey(1), x)
    jax.tree.map(np.testing.assert_array_equal, params, ref)

    def loss(p, xx):
        y = mod.apply(p, xx)
        return jnp.sum(jnp.sin(y)), y

    outs = {}
    for flag in (False, True):
        monkeypatch.setattr(layers, "MXU_BIAS_GRAD", flag)
        (l, y), g = jax.value_and_grad(loss, argnums=(0, 1),
                                       has_aux=True)(params, x)
        outs[flag] = (np.asarray(y), g)
    np.testing.assert_array_equal(outs[False][0], outs[True][0])
    gp0, gx0 = outs[False][1]
    gp1, gx1 = outs[True][1]
    np.testing.assert_allclose(gx1, gx0, rtol=1e-6)
    np.testing.assert_allclose(gp1["params"]["kernel"],
                               gp0["params"]["kernel"], rtol=3e-5,
                               atol=1e-6)
    np.testing.assert_allclose(gp1["params"]["bias"],
                               gp0["params"]["bias"], rtol=1e-5, atol=1e-6)


def test_replay_dropout_matches_saved_mask(monkeypatch):
    """REPLAY_DROPOUT switch (models/layers.py): regenerating the keep mask
    from the PRNG key in the backward must be bit-identical to the saved-
    mask default in both output and gradient (same bernoulli draw, same
    select/scale math). Also pins ReplayDropout == nn.Dropout under the
    same rng stream — on the LEGACY bernoulli bit policy
    (U8_DROPOUT_BITS=False; the round-5 default is the u8 stream, which
    is distribution- but not bit-compatible with nn.Dropout)."""
    import flax.linen as nn

    from multi_modal_foundation_model_tpu.models import layers

    monkeypatch.setattr(layers, "U8_DROPOUT_BITS", False)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 33))
    key = jax.random.PRNGKey(7)

    def run(module):
        def loss(xx):
            y = module.apply({}, xx, deterministic=False,
                             rngs={"dropout": key})
            return jnp.sum(jnp.cos(y))
        return jax.value_and_grad(loss)(x)

    outs = {}
    for flag in (False, True):
        monkeypatch.setattr(layers, "REPLAY_DROPOUT", flag)
        outs[flag] = run(layers.ReplayDropout(0.4))
    np.testing.assert_array_equal(np.asarray(outs[False][0]),
                                  np.asarray(outs[True][0]))
    np.testing.assert_array_equal(np.asarray(outs[False][1]),
                                  np.asarray(outs[True][1]))
    l_nn, g_nn = run(nn.Dropout(0.4))
    np.testing.assert_array_equal(np.asarray(outs[False][0]),
                                  np.asarray(l_nn))
    np.testing.assert_array_equal(np.asarray(outs[False][1]),
                                  np.asarray(g_nn))


def test_u8_dropout_keep_rate_and_unbiasedness(monkeypatch):
    """U8_DROPOUT_BITS switch (models/layers.py): the u8-threshold keep
    mask matches its quantized keep probability round((1-rate)*256)/256
    (binomial tolerance) and the survivor rescale keeps the estimator
    unbiased: E[dropout(x)] == x under both bit policies."""
    from multi_modal_foundation_model_tpu.models import layers

    rate = 0.4
    n = 200_000
    x = jnp.ones((n,))
    key = jax.random.PRNGKey(3)

    outs = {}
    for flag in (False, True):
        monkeypatch.setattr(layers, "U8_DROPOUT_BITS", flag)
        y = layers.ReplayDropout(rate).apply(
            {}, x, deterministic=False, rngs={"dropout": key})
        outs[flag] = np.asarray(y)

    # u8 path: keep probability is exactly (256 - round(rate*256))/256
    t = int(round(rate * 256))
    keep_p = (256 - t) / 256.0
    kept = outs[True] != 0.0
    se = np.sqrt(keep_p * (1 - keep_p) / n)
    assert abs(kept.mean() - keep_p) < 5 * se
    # survivors carry the exact quantized inverse scale -> unbiased mean
    np.testing.assert_allclose(outs[True][kept], 1.0 / keep_p, rtol=1e-6)
    assert abs(outs[True].mean() - 1.0) < 5 * se / keep_p
    # default path unchanged: bernoulli at exactly 1-rate, scale 1/(1-rate)
    kept0 = outs[False] != 0.0
    np.testing.assert_allclose(outs[False][kept0], 1.0 / (1 - rate),
                               rtol=1e-6)
    assert abs(kept0.mean() - (1 - rate)) < 5 * se
    # the two policies draw DIFFERENT streams (documented contract)
    assert (kept != kept0).any()


def test_u8_dropout_replay_backward_matches_forward_mask(monkeypatch):
    """With U8_DROPOUT_BITS on, the replay VJP regenerates the identical
    u8 keep mask: grad nonzero exactly where the output is."""
    from multi_modal_foundation_model_tpu.models import layers

    monkeypatch.setattr(layers, "U8_DROPOUT_BITS", True)
    monkeypatch.setattr(layers, "REPLAY_DROPOUT", True)
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 33))
    key = jax.random.PRNGKey(7)
    mod = layers.ReplayDropout(0.4)

    def loss(xx):
        return jnp.sum(mod.apply({}, xx, deterministic=False,
                                 rngs={"dropout": key}))

    y = mod.apply({}, x, deterministic=False, rngs={"dropout": key})
    g = jax.grad(loss)(x)
    np.testing.assert_array_equal(np.asarray(y != 0), np.asarray(g != 0))
