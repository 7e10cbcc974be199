"""Reference-weight parity harness.

Constructs the ACTUAL reference torch model from ``/root/reference/src``
(imported, never copied), maps its ``state_dict()`` onto this framework's
flax param tree via ``utils.torch_convert``, and asserts that identical
weights + identical inputs produce identical forward losses and
predictions for every eval-mask objective the trainer uses
(``/root/reference/src/trainer/base.py:79-101``):

- encoding   (behavior -> spikes: ap eval_mask all-ones)
- decoding   (spikes -> behavior: behavior eval_mask all-ones)
- token-masking with an explicit temporal eval-mask pattern (the
  deterministic twin of the eval_mask=None path — both frameworks apply
  the same batch-uniform zeroing, ``mm.py:147-149``)

Also pins down, executably, the reference's MtM input-masking defect: with
``masking_mode`` set, ``mm.py:272`` reads a ``mask`` variable the masking
branch never assigns (only ``spike_mask`` is set) -> NameError. This
framework derives the token mask from the sampled element mask — the
behavior that code path evidently intends (models/multimodal.py).
"""

import os
import sys

import numpy as np
import pytest

REF_SRC = "/root/reference/src"
MM_YAML = os.path.join(REF_SRC, "configs/multi_modal/mm.yaml")

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference source not mounted")

AVAIL_MOD = ("ap", "behavior")


# ---------------------------------------------------------------------------
# reference-side construction (imports the reference; does not copy it)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref():
    sys.path.insert(0, REF_SRC)
    import importlib

    mods = {}
    try:
        mods["config_utils"] = importlib.import_module("utils.config_utils")
        mods["mm"] = importlib.import_module("multi_modal.mm")
        mods["enc_emb"] = importlib.import_module(
            "multi_modal.encoder_embeddings")
        mods["dec_emb"] = importlib.import_module(
            "multi_modal.decoder_embeddings")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    yield mods
    sys.path.remove(REF_SRC)


def build_ref_model(ref, n_neurons, n_behaviors, *, max_F, hidden_size,
                    n_layers, n_heads, inter_size, seed=0):
    """Assemble the reference MultiModal exactly as
    ``src/train_multi_modal.py:160-189`` does."""
    torch.manual_seed(seed)
    over = {
        "encoder": {
            "embedder": {"max_F": max_F},
            "transformer": {"n_layers": n_layers, "hidden_size": hidden_size,
                            "n_heads": n_heads, "inter_size": inter_size},
        },
        "decoder": {
            "embedder": {"max_F": max_F},
            "transformer": {"n_layers": n_layers, "hidden_size": hidden_size,
                            "n_heads": n_heads, "inter_size": inter_size},
        },
    }
    config = ref["config_utils"].update_config(MM_YAML, over)

    enc, dec = {}, {}
    for mod in AVAIL_MOD:
        n_ch = n_neurons if mod == "ap" else n_behaviors
        enc[mod] = ref["enc_emb"].EncoderEmbedding(
            hidden_size=hidden_size, n_channel=n_ch, config=config.encoder)
        dec[mod] = ref["dec_emb"].DecoderEmbedding(
            hidden_size=hidden_size, n_channel=n_ch, output_channel=n_ch,
            config=config.decoder)
    model = ref["mm"].MultiModal(
        enc, dec, avail_mod=list(AVAIL_MOD), config=config,
        share_modality_embeddings=True)
    model.eval()
    return model


def ref_mod_dict(spikes, behavior, attn, ts, eval_masks, masking_mode=None):
    """The trainer's mod_dict contract (``trainer/base.py:57-101``)."""
    md = {}
    arrays = {"ap": spikes, "behavior": behavior}
    for i, mod in enumerate(AVAIL_MOD):
        x = torch.tensor(arrays[mod])
        d = {
            "inputs_modality": torch.tensor(i),
            "targets_modality": torch.tensor(i),
            "inputs_attn_mask": torch.tensor(attn, dtype=torch.int64),
            "inputs_timestamp": torch.tensor(ts, dtype=torch.int64),
            "targets_timestamp": torch.tensor(ts, dtype=torch.int64),
            "eid": "test-session",
            "num_neuron": spikes.shape[2],
            "masking_mode": masking_mode,
            "inputs": x.clone(),
            "targets": x.clone(),
            "eval_mask": (None if eval_masks[mod] is None else
                          torch.tensor(eval_masks[mod], dtype=torch.int64)),
        }
        if mod == "ap":
            d["inputs_regions"] = np.full((spikes.shape[2], spikes.shape[0]),
                                          "CA1")
        md[mod] = d
    return md


# ---------------------------------------------------------------------------
# flax-side twin
# ---------------------------------------------------------------------------

def build_flax_model(n_neurons, n_behaviors, *, max_F, hidden_size, n_layers,
                     n_heads, inter_size):
    import jax.numpy as jnp

    from multi_modal_foundation_model_tpu.models.multimodal import (
        MultiModal, MultiModalConfig)
    from multi_modal_foundation_model_tpu.ops.masking import MaskParams

    cfg = MultiModalConfig(
        n_channels={"ap": n_neurons, "behavior": n_behaviors},
        max_F=max_F, hidden_size=hidden_size, n_enc_layers=n_layers,
        n_dec_layers=n_layers, n_heads=n_heads, inter_size=inter_size,
        attn_impl="xla", compute_dtype=jnp.float32,
        mask_params=MaskParams(ratio=0.3), remat_layers=False)
    return MultiModal(cfg)


def flax_inputs(spikes, behavior, attn, ts, eval_masks):
    import jax.numpy as jnp

    from multi_modal_foundation_model_tpu.models.multimodal import \
        ModalityInput

    out = {}
    arrays = {"ap": spikes, "behavior": behavior}
    for mod in AVAIL_MOD:
        x = jnp.asarray(arrays[mod])
        em = eval_masks[mod]
        out[mod] = ModalityInput(
            inputs=x, targets=x, attn_mask=jnp.asarray(attn, jnp.int32),
            timestamps=jnp.asarray(ts, jnp.int32),
            eval_mask=None if em is None else jnp.asarray(em, jnp.int32))
    return out


def converted_params(ref_model, n_layers):
    from multi_modal_foundation_model_tpu.utils.torch_convert import \
        reference_state_dict_to_params

    sd = {k: v.detach().cpu().numpy()
          for k, v in ref_model.state_dict().items()}
    return reference_state_dict_to_params(
        sd, avail_mod=AVAIL_MOD, n_enc_layers=n_layers,
        n_dec_layers=n_layers)


def _tree_paths(tree, prefix=()):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= _tree_paths(v, prefix + (k,))
        else:
            out.add(prefix + (k,))
    return out


def make_batch(rng, B, T, N, n_beh, pad_tail=0):
    spikes = rng.poisson(0.5, (B, T, N)).astype("float32")
    behavior = rng.normal(size=(B, T, n_beh)).astype("float32")
    attn = np.ones((B, T), dtype="int64")
    if pad_tail:
        attn[0, -pad_tail:] = 0
    ts = np.tile(np.arange(T, dtype="int64"), (B, 1))
    return spikes, behavior, attn, ts


def objective_masks(objective, B, T, N, n_beh):
    """eval_mask per modality, as the trainer builds them
    (``trainer/base.py:79-101``; shapes normalized to each modality's own
    channel count — only ``[:, :, 0]`` is consumed, ``mm.py:270``)."""
    ones_sp = np.ones((B, T, N), "int64")
    zero_sp = np.zeros((B, T, N), "int64")
    ones_be = np.ones((B, T, n_beh), "int64")
    zero_be = np.zeros((B, T, n_beh), "int64")
    if objective == "encoding":
        return {"ap": ones_sp, "behavior": zero_be}
    if objective == "decoding":
        return {"ap": zero_sp, "behavior": ones_be}
    if objective == "token_masking":
        # deterministic temporal pattern standing in for the masker draw
        m_sp, m_be = zero_sp.copy(), zero_be.copy()
        m_sp[:, 1::4, :] = 1
        m_be[:, 2::5, :] = 1
        return {"ap": m_sp, "behavior": m_be}
    raise ValueError(objective)


SMALL = dict(max_F=8, hidden_size=32, n_layers=2, n_heads=2, inter_size=64)
FULL = dict(max_F=100, hidden_size=256, n_layers=5, n_heads=8,
            inter_size=512)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_converter_covers_param_tree(ref):
    """Converted tree must be structurally identical to model.init's."""
    import jax

    N, n_beh = 12, 2
    ref_model = build_ref_model(ref, N, n_beh, **SMALL)
    flax_model = build_flax_model(N, n_beh, **SMALL)
    rng = np.random.default_rng(0)
    spikes, behavior, attn, ts = make_batch(rng, 2, SMALL["max_F"], N, n_beh)
    masks = objective_masks("encoding", 2, SMALL["max_F"], N, n_beh)
    init_params = flax_model.init(
        {"params": jax.random.PRNGKey(0)},
        flax_inputs(spikes, behavior, attn, ts, masks),
        training=False)["params"]
    conv = converted_params(ref_model, SMALL["n_layers"])
    assert _tree_paths(conv) == _tree_paths(init_params)


def test_state_dict_round_trip(ref):
    from multi_modal_foundation_model_tpu.utils.torch_convert import \
        params_to_reference_state_dict

    ref_model = build_ref_model(ref, 12, 2, **SMALL)
    sd = {k: v.detach().cpu().numpy()
          for k, v in ref_model.state_dict().items()}
    params = converted_params(ref_model, SMALL["n_layers"])
    sd2 = params_to_reference_state_dict(params, avail_mod=AVAIL_MOD)
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(sd[k], sd2[k], err_msg=k)


@pytest.mark.parametrize("objective",
                         ["encoding", "decoding", "token_masking"])
def test_forward_parity_small(ref, objective):
    """Same weights + same inputs => same loss and mod_preds (f32 tol),
    with a padded trial exercising the attn-mask path."""
    N, n_beh, B = 12, 2, 4
    T = SMALL["max_F"]
    ref_model = build_ref_model(ref, N, n_beh, **SMALL)
    flax_model = build_flax_model(N, n_beh, **SMALL)
    params = converted_params(ref_model, SMALL["n_layers"])

    rng = np.random.default_rng(7)
    spikes, behavior, attn, ts = make_batch(rng, B, T, N, n_beh, pad_tail=2)
    masks = objective_masks(objective, B, T, N, n_beh)

    with torch.no_grad():
        ref_out = ref_model(ref_mod_dict(spikes, behavior, attn, ts, masks))
    flax_out = flax_model.apply(
        {"params": params}, flax_inputs(spikes, behavior, attn, ts, masks),
        training=False)

    np.testing.assert_allclose(
        float(flax_out.loss), float(ref_out.loss), rtol=2e-4, atol=1e-6)
    for mod in AVAIL_MOD:
        np.testing.assert_allclose(
            int(flax_out.mod_n_examples[mod]),
            int(ref_out.mod_n_examples[mod]))
        np.testing.assert_allclose(
            np.asarray(flax_out.mod_preds[mod]),
            ref_out.mod_preds[mod].numpy(),
            rtol=5e-4, atol=2e-5, err_msg=f"{objective}/{mod} preds")


def test_forward_parity_full_size(ref):
    """Reference workload shape (5+5 layers, H=256, N=668, T=100): loss and
    per-modality loss sums must track at f32 tolerance."""
    N, n_beh, B = 668, 2, 2
    T = FULL["max_F"]
    ref_model = build_ref_model(ref, N, n_beh, **FULL)
    flax_model = build_flax_model(N, n_beh, **FULL)
    params = converted_params(ref_model, FULL["n_layers"])

    rng = np.random.default_rng(3)
    spikes, behavior, attn, ts = make_batch(rng, B, T, N, n_beh)
    masks = objective_masks("decoding", B, T, N, n_beh)

    with torch.no_grad():
        ref_out = ref_model(ref_mod_dict(spikes, behavior, attn, ts, masks))
    flax_out = flax_model.apply(
        {"params": params}, flax_inputs(spikes, behavior, attn, ts, masks),
        training=False)

    np.testing.assert_allclose(
        float(flax_out.loss), float(ref_out.loss), rtol=5e-4)
    for mod in AVAIL_MOD:
        np.testing.assert_allclose(
            float(flax_out.mod_loss[mod]), float(ref_out.mod_loss[mod]),
            rtol=5e-4, atol=1e-4, err_msg=mod)


def test_grad_parity_small(ref):
    """Backward parity: at identical weights, d(loss)/d(params) must match
    between torch autograd and jax.grad for the decoding objective (the
    regime of the normalization anomaly — RESULTS.md). With forward AND
    backward matching, any training-trajectory divergence can only come
    from the optimizer, not the model."""
    import jax

    from multi_modal_foundation_model_tpu.utils.torch_convert import \
        params_to_reference_state_dict

    N, n_beh, B = 12, 2, 4
    T = SMALL["max_F"]
    ref_model = build_ref_model(ref, N, n_beh, **SMALL)
    flax_model = build_flax_model(N, n_beh, **SMALL)
    params = converted_params(ref_model, SMALL["n_layers"])

    rng = np.random.default_rng(11)
    spikes, behavior, attn, ts = make_batch(rng, B, T, N, n_beh)
    masks = objective_masks("decoding", B, T, N, n_beh)

    ref_model.train(False)
    ref_out = ref_model(ref_mod_dict(spikes, behavior, attn, ts, masks))
    ref_out.loss.backward()
    ref_grads = {k: (p.grad.detach().numpy() if p.grad is not None
                     else np.zeros(p.shape, "float32"))
                 for k, p in ref_model.named_parameters()}

    def loss_fn(p):
        out = flax_model.apply(
            {"params": p}, flax_inputs(spikes, behavior, attn, ts, masks),
            training=False)
        return out.loss

    flax_grads = jax.grad(loss_fn)(params)
    # export flax grads into reference naming for elementwise comparison;
    # the shared mod_emb's torch grad accumulates over both aliases, so
    # compare against the flax grad directly for those
    sd_grads = params_to_reference_state_dict(flax_grads,
                                              avail_mod=AVAIL_MOD)
    checked = 0
    for k, g_ref in ref_grads.items():
        if "mod_emb" in k:
            continue  # aliased param: torch reports grad once on the
            # shared tensor; covered via the flax tree below
        np.testing.assert_allclose(
            sd_grads[k], g_ref, rtol=1e-3, atol=1e-5, err_msg=k)
        checked += 1
    assert checked > 40
    for m in AVAIL_MOD:
        g_ref = ref_grads[f"encoder_embeddings.{m}.embedder.mod_emb.weight"]
        np.testing.assert_allclose(
            np.asarray(flax_grads[f"enc_mod_emb_{m}"]["embedding"]), g_ref,
            rtol=1e-3, atol=1e-5, err_msg=f"shared mod_emb {m}")


def test_reference_mtm_input_masking_raises(ref):
    """Documents the reference defect this framework repairs: with
    ``masking_mode`` set (MtM ``mask_type=='input'`` path,
    ``trainer/base.py:186-188``), ``mm.py:272`` reads ``mask`` which the
    masking branch never assigns -> NameError. The flax model instead
    derives the token mask from the sampled element mask
    (models/multimodal.py::_resolve_masks)."""
    N, n_beh, B = 12, 2, 2
    T = SMALL["max_F"]
    ref_model = build_ref_model(ref, N, n_beh, **SMALL)
    rng = np.random.default_rng(5)
    spikes, behavior, attn, ts = make_batch(rng, B, T, N, n_beh)
    masks = {"ap": None, "behavior": None}
    md = ref_mod_dict(spikes, behavior, attn, ts, masks,
                      masking_mode="temporal")
    with pytest.raises(NameError):
        with torch.no_grad():
            ref_model(md)


def test_load_reference_checkpoint_both_formats(ref, tmp_path):
    """Reference-trained checkpoints load directly into this framework:
    both the portable state_dict form and the reference's whole-module
    pickle (``trainer/base.py:302-308``), with config inferred from the
    state_dict; eval forward matches torch."""
    import jax.numpy as jnp

    from multi_modal_foundation_model_tpu.eval.loading import \
        load_reference_checkpoint

    N, n_beh, B = 12, 2, 3
    T = SMALL["max_F"]
    ref_model = build_ref_model(ref, N, n_beh, **SMALL)
    p1 = tmp_path / "state_dict.pt"
    torch.save(ref_model.state_dict(), p1)
    p2 = tmp_path / "model_best.pt"
    torch.save({"model": ref_model, "epoch": 7}, p2)

    rng = np.random.default_rng(9)
    spikes, behavior, attn, ts = make_batch(rng, B, T, N, n_beh)
    masks = objective_masks("encoding", B, T, N, n_beh)
    with torch.no_grad():
        ref_out = ref_model(ref_mod_dict(spikes, behavior, attn, ts, masks))

    for path in (p1, p2):
        model, params = load_reference_checkpoint(
            str(path), n_channels={"ap": N, "behavior": n_beh}, max_F=T,
            reference_src=REF_SRC, attn_impl="xla",
            compute_dtype=jnp.float32, inter_size=SMALL["inter_size"],
            n_heads=SMALL["n_heads"])
        assert model.config.n_enc_layers == SMALL["n_layers"]
        assert model.config.hidden_size == SMALL["hidden_size"]
        assert model.config.force_active is False
        out = model.apply(
            {"params": params},
            flax_inputs(spikes, behavior, attn, ts, masks), training=False)
        np.testing.assert_allclose(float(out.loss), float(ref_out.loss),
                                   rtol=2e-4, err_msg=str(path))
