"""Oracle test: run the REFERENCE eval harness end-to-end vs ours.

The strongest form of metric parity (VERDICT r3 item 3): execute the
reference's own ``co_smoothing_eval`` (``/root/reference/src/utils/
eval_utils.py:93-757``) — the function that produces the project's
acceptance metrics — on the actual reference torch ``MultiModal`` with
weights CONVERTED from this framework's flax model, over shared synthetic
data, for every runnable eval mode; then run this framework's
``eval.harness.co_smoothing_eval`` on the same weights + data and assert
the ``bps.npy``/``r2.npy`` artifacts and the summary metric dicts agree
to <=1%.

This goes beyond tests/test_parity_reference.py (model forward/grad
parity): it exercises the reference's heldout-mask construction, its
mod_dict assembly (``eval_utils.py:166-193``), exp()-rate conversion,
bits-per-spike and PSTH/trial-R2 pipeline — against this framework's
vmapped-sweep harness — so the <=1% claim rests on the reference's own
instrument, not a re-implementation of it.

Offline-runnable: no network; the reference import chain needs stubs for
``wandb``/``torcheval`` (unused by the eval path) and a shim for the
removed ``datasets.list_datasets`` symbol.
"""

import importlib
import importlib.machinery
import os
import sys
import types

import numpy as np
import pytest

REF_SRC = "/root/reference/src"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference source not mounted")

torch = pytest.importorskip("torch")

# shared builders from the model-parity suite (same tests/ dir)
import test_parity_reference as tpr  # noqa: E402

# geometry: small enough that the reference's O(N)-forwards modes run in
# seconds, large enough for 3 multi-neuron regions and PSTH conditions
B, T, N, N_BEH = 20, 30, 24, 2
REGIONS = np.array(["LP"] * 8 + ["CA1"] * 8 + ["PO"] * 8)
SIZES = dict(max_F=T, hidden_size=32, n_layers=2, n_heads=2, inter_size=64)
AVAIL_BEH = ["wheel-speed", "whisker-motion-energy"]


@pytest.fixture(scope="module")
def ref_eval():
    """Import the reference eval harness with offline stubs."""
    sys.path.insert(0, REF_SRC)
    try:
        import datasets
        if not hasattr(datasets, "list_datasets"):
            datasets.list_datasets = lambda *a, **k: []
        for name in ("wandb", "torcheval", "torcheval.metrics"):
            if name not in sys.modules:
                m = types.ModuleType(name)
                m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
                sys.modules[name] = m
        if not hasattr(sys.modules["torcheval.metrics"], "R2Score"):
            sys.modules["torcheval.metrics"].R2Score = type(
                "R2Score", (), {"__init__": lambda self, *a, **k: None})
            sys.modules["torcheval"].metrics = sys.modules[
                "torcheval.metrics"]
        try:
            eu = importlib.import_module("utils.eval_utils")
        except Exception as e:  # pragma: no cover
            pytest.skip(f"reference eval_utils import failed: {e}")
        yield eu
    finally:
        sys.path.remove(REF_SRC)


@pytest.fixture(scope="module")
def shared(ref_eval):
    """Reference torch model + flax twin with converted weights + one
    shared synthetic test batch in both harnesses' input formats."""
    ref_modules = {}
    ref_modules["config_utils"] = importlib.import_module(
        "utils.config_utils")
    ref_modules["mm"] = importlib.import_module("multi_modal.mm")
    ref_modules["enc_emb"] = importlib.import_module(
        "multi_modal.encoder_embeddings")
    ref_modules["dec_emb"] = importlib.import_module(
        "multi_modal.decoder_embeddings")

    ref_model = tpr.build_ref_model(ref_modules, N, N_BEH, **SIZES)
    # the reference eval entry disables the masker (eval_utils.py:64-67)
    ref_model.masker.ratio = 0
    ref_model.masker.mask_regions = []
    ref_model.masker.target_regions = []
    flax_model = tpr.build_flax_model(N, N_BEH, **SIZES)
    params = tpr.converted_params(ref_model, SIZES["n_layers"])

    rng = np.random.default_rng(7)
    spikes = rng.poisson(0.6, (B, T, N)).astype("float32")
    behavior = rng.normal(size=(B, T, N_BEH)).astype("float32")
    attn = np.ones((B, T), dtype="int64")
    ts = np.tile(np.arange(T, dtype="int64"), (B, 1))
    choice = rng.choice([-1.0, 1.0], B).astype("float32")
    reward = rng.choice([0.0, 1.0], B).astype("float32")
    block = rng.choice([0.2, 0.5, 0.8], B).astype("float32")
    uuids = [f"uuid{i:04d}" for i in range(N)]

    torch_batch = {
        "spikes_data": torch.tensor(spikes),
        "time_attn_mask": torch.tensor(attn),
        "space_attn_mask": torch.ones((B, N), dtype=torch.int64),
        "spikes_timestamps": torch.tensor(ts),
        "target": torch.tensor(behavior),
        "neuron_regions": np.tile(REGIONS[:, None], (1, B)),
        "eid": ["oracle-session"] * B,
        "choice": torch.tensor(choice),
        "reward": torch.tensor(reward),
        "block": torch.tensor(block),
    }
    np_batch = {
        "spikes_data": spikes,
        "time_attn_mask": attn,
        "space_attn_mask": np.ones((B, N), dtype="int64"),
        "spikes_timestamps": ts,
        "target": behavior,
        "neuron_regions": REGIONS,
        "eid": "oracle-session",
        "choice": choice,
        "reward": reward,
        "block": block,
    }
    test_dataset = {
        "cluster_uuids": [uuids],
        "cluster_regions": [list(REGIONS)],
        "choice": choice,
        "reward": reward,
        "block": block,
    }
    return dict(ref_eval=ref_eval, ref_model=ref_model,
                flax_model=flax_model, params=params,
                torch_batch=torch_batch, np_batch=np_batch,
                test_dataset=test_dataset)


class _RefModelShim:
    """Forwards to the reference model, supplying the one thing the
    reference eval harness forgets for the per_neuron / forward_pred /
    inter_region modes: a behavior ``eval_mask``. Those mode blocks build
    mod_dicts without it (``eval_utils.py:166-193,258-287,398-427``) and
    ``mm.py:266`` KeyErrors — the modes are unreachable in the stock
    reference (its entry script only enables modal_spike/modal_behavior,
    ``eval_multi_modal.py:71-80``). The shim inserts the zeros eval_mask
    the modal_spike block uses explicitly (``eval_utils.py:595``), i.e.
    'behavior fully visible' — the evident intent — leaving every other
    byte of the reference path untouched."""

    def __init__(self, model):
        object.__setattr__(self, "_m", model)

    def __getattr__(self, k):
        return getattr(object.__getattribute__(self, "_m"), k)

    def __call__(self, mod_dict):
        for d in mod_dict.values():
            if "eval_mask" not in d:
                d["eval_mask"] = torch.zeros_like(
                    d["targets"]).to(torch.int64)
        return object.__getattribute__(self, "_m")(mod_dict)


# modal_spike / modal_behavior run on the stock reference; the sweep modes
# need the eval_mask shim (see _RefModelShim)
SHIMMED_MODES = ("per_neuron", "forward_pred", "inter_region")


def _run_reference(shared, mode, held_out_list, save_path):
    accelerator = types.SimpleNamespace(device=torch.device("cpu"))
    kwargs = dict(
        method_name="oracle", mode=mode, is_aligned=True,
        target_regions=["all"], n_time_steps=T,
        held_out_list=held_out_list, save_path=str(save_path),
        subtract="task", onset_alignment=[5], avail_beh=AVAIL_BEH,
        n_jobs=1)
    model = shared["ref_model"]
    if mode in SHIMMED_MODES:
        model = _RefModelShim(model)
    return shared["ref_eval"].co_smoothing_eval(
        model, accelerator, [shared["torch_batch"]],
        shared["test_dataset"], save_plot=False, use_mtm=False, **kwargs)


def _run_ours(shared, mode, held_out_list, save_path):
    from multi_modal_foundation_model_tpu.eval.harness import \
        co_smoothing_eval

    return co_smoothing_eval(
        shared["flax_model"], shared["params"], [shared["np_batch"]],
        mode=mode, use_mtm=False, save_path=str(save_path),
        method_name="oracle", is_aligned=True, target_regions=("all",),
        n_time_steps=T, held_out_list=held_out_list, avail_beh=AVAIL_BEH,
        subtract="task", onset_alignment=[5])


def _assert_close(name, a, b, rtol=1e-2, atol=1e-3):
    a, b = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
    assert a.shape == b.shape, f"{name}: shape {a.shape} vs {b.shape}"
    both_nan = np.isnan(a) & np.isnan(b)
    assert (np.isnan(a) == np.isnan(b)).all(), f"{name}: NaN pattern differs"
    ok = np.isclose(a, b, rtol=rtol, atol=atol) | both_nan
    worst = None
    if not ok.all():
        i = np.unravel_index(
            np.nanargmax(np.where(both_nan, 0, np.abs(a - b))), a.shape)
        worst = (i, a[i], b[i])
    assert ok.all(), f"{name}: max deviation at {worst}"


HELDOUT = {
    "per_neuron": None,
    "forward_pred": np.arange(int(T * 0.7), T),
    "inter_region": None,
    "intra_region": None,
    "modal_spike": np.arange(T),
    "modal_behavior": np.arange(T),
}


def test_reference_sweep_modes_crash_unshimmed(shared, tmp_path):
    """Pin the latent reference defects the shim works around: the sweep
    modes KeyError on the missing behavior eval_mask (``mm.py:266``), and
    intra_region NameErrors on the undefined ``heldout_idxs``
    (``eval_utils.py:510``) even with the shim."""
    accelerator = types.SimpleNamespace(device=torch.device("cpu"))
    kwargs = dict(method_name="oracle", is_aligned=True,
                  target_regions=["all"], n_time_steps=T,
                  held_out_list=None, save_path=str(tmp_path),
                  subtract="task", onset_alignment=[5], avail_beh=AVAIL_BEH,
                  n_jobs=1)
    with pytest.raises(KeyError):
        shared["ref_eval"].co_smoothing_eval(
            shared["ref_model"], accelerator, [shared["torch_batch"]],
            shared["test_dataset"], save_plot=False, use_mtm=False,
            mode="per_neuron", **kwargs)
    with pytest.raises(NameError):
        shared["ref_eval"].co_smoothing_eval(
            _RefModelShim(shared["ref_model"]), accelerator,
            [shared["torch_batch"]], shared["test_dataset"],
            save_plot=False, use_mtm=False, mode="intra_region", **kwargs)


@pytest.mark.parametrize("mode", ["per_neuron", "forward_pred",
                                  "inter_region", "modal_spike"])
def test_oracle_mode_agreement(shared, mode, tmp_path):
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_res = _run_reference(shared, mode, HELDOUT[mode], ref_dir)
    our_res = _run_ours(shared, mode, HELDOUT[mode], our_dir)

    ref_bps = np.load(ref_dir / "bps.npy", allow_pickle=True)
    our_bps = np.load(our_dir / "bps.npy", allow_pickle=True)
    ref_r2 = np.load(ref_dir / "r2.npy", allow_pickle=True)
    our_r2 = np.load(our_dir / "r2.npy", allow_pickle=True)
    _assert_close(f"{mode} bps", ref_bps, our_bps)
    _assert_close(f"{mode} r2", ref_r2, our_r2)
    for key in ref_res:
        _assert_close(f"{mode} result[{key}]", ref_res[key], our_res[key])


def test_oracle_modal_behavior(shared, tmp_path):
    mode = "modal_behavior"
    ref_res = _run_reference(shared, mode, HELDOUT[mode], tmp_path / "ref")
    our_res = _run_ours(shared, mode, HELDOUT[mode], tmp_path / "ours")
    ref_d = ref_res[f"{mode}_behav_results"]
    our_d = our_res[f"{mode}_behav_results"]
    assert set(ref_d) == set(our_d)
    for key in ref_d:
        _assert_close(f"{mode} {key}", ref_d[key], our_d[key])


# ---------------------------------------------------------------------------
# Full-size oracle (VERDICT r4 ask #5): the single-forward modes at the
# reference's production geometry — B=16, T=100, N=668, 5+5 layers, H=256
# (the shape the headline metrics are reported at). One reference forward
# each, so CPU-feasible; marked slow (minutes, not seconds).
# ---------------------------------------------------------------------------

FB, FT, FN = 16, 100, 668
FULL_SIZES = dict(max_F=FT, hidden_size=256, n_layers=5, n_heads=8,
                  inter_size=512)
FULL_REGIONS = np.concatenate([
    np.repeat(["LP", "CA1", "PO", "DG", "VISa"], 128),
    np.repeat(["root"], FN - 5 * 128)])


@pytest.fixture(scope="module")
def shared_full(ref_eval):
    """Full-geometry twin of ``shared`` (reference model + converted flax
    params + one shared batch)."""
    ref_modules = {
        "config_utils": importlib.import_module("utils.config_utils"),
        "mm": importlib.import_module("multi_modal.mm"),
        "enc_emb": importlib.import_module("multi_modal.encoder_embeddings"),
        "dec_emb": importlib.import_module("multi_modal.decoder_embeddings"),
    }
    ref_model = tpr.build_ref_model(ref_modules, FN, N_BEH, **FULL_SIZES)
    ref_model.masker.ratio = 0
    ref_model.masker.mask_regions = []
    ref_model.masker.target_regions = []
    flax_model = tpr.build_flax_model(FN, N_BEH, **FULL_SIZES)
    params = tpr.converted_params(ref_model, FULL_SIZES["n_layers"])

    rng = np.random.default_rng(11)
    spikes = rng.poisson(0.6, (FB, FT, FN)).astype("float32")
    behavior = rng.normal(size=(FB, FT, N_BEH)).astype("float32")
    attn = np.ones((FB, FT), dtype="int64")
    ts = np.tile(np.arange(FT, dtype="int64"), (FB, 1))
    choice = rng.choice([-1.0, 1.0], FB).astype("float32")
    reward = rng.choice([0.0, 1.0], FB).astype("float32")
    block = rng.choice([0.2, 0.5, 0.8], FB).astype("float32")

    torch_batch = {
        "spikes_data": torch.tensor(spikes),
        "time_attn_mask": torch.tensor(attn),
        "space_attn_mask": torch.ones((FB, FN), dtype=torch.int64),
        "spikes_timestamps": torch.tensor(ts),
        "target": torch.tensor(behavior),
        "neuron_regions": np.tile(FULL_REGIONS[:, None], (1, FB)),
        "eid": ["oracle-full"] * FB,
        "choice": torch.tensor(choice),
        "reward": torch.tensor(reward),
        "block": torch.tensor(block),
    }
    np_batch = {
        "spikes_data": spikes,
        "time_attn_mask": attn,
        "space_attn_mask": np.ones((FB, FN), dtype="int64"),
        "spikes_timestamps": ts,
        "target": behavior,
        "neuron_regions": FULL_REGIONS,
        "eid": "oracle-full",
        "choice": choice,
        "reward": reward,
        "block": block,
    }
    test_dataset = {
        "cluster_uuids": [[f"uuid{i:04d}" for i in range(FN)]],
        "cluster_regions": [list(FULL_REGIONS)],
        "choice": choice,
        "reward": reward,
        "block": block,
    }
    return dict(ref_eval=ref_eval, ref_model=ref_model,
                flax_model=flax_model, params=params,
                torch_batch=torch_batch, np_batch=np_batch,
                test_dataset=test_dataset)


def _full_kwargs(mode, save_path):
    return dict(method_name="oracle", mode=mode, is_aligned=True,
                target_regions=["all"], n_time_steps=FT,
                held_out_list=list(range(FT)), save_path=str(save_path),
                subtract="task", onset_alignment=[5], avail_beh=AVAIL_BEH,
                n_jobs=1)


@pytest.mark.slow
def test_oracle_full_shape_modal_spike(shared_full, tmp_path):
    accelerator = types.SimpleNamespace(device=torch.device("cpu"))
    ref_res = shared_full["ref_eval"].co_smoothing_eval(
        shared_full["ref_model"], accelerator,
        [shared_full["torch_batch"]], shared_full["test_dataset"],
        save_plot=False, use_mtm=False,
        **_full_kwargs("modal_spike", tmp_path / "ref"))

    from multi_modal_foundation_model_tpu.eval.harness import \
        co_smoothing_eval
    our_res = co_smoothing_eval(
        shared_full["flax_model"], shared_full["params"],
        [shared_full["np_batch"]], mode="modal_spike", use_mtm=False,
        save_path=str(tmp_path / "ours"), method_name="oracle",
        is_aligned=True, target_regions=("all",), n_time_steps=FT,
        held_out_list=list(range(FT)), avail_beh=AVAIL_BEH,
        subtract="task", onset_alignment=[5])

    ref_bps = np.load(tmp_path / "ref" / "bps.npy", allow_pickle=True)
    our_bps = np.load(tmp_path / "ours" / "bps.npy", allow_pickle=True)
    ref_r2 = np.load(tmp_path / "ref" / "r2.npy", allow_pickle=True)
    our_r2 = np.load(tmp_path / "ours" / "r2.npy", allow_pickle=True)
    assert ref_bps.shape == (FN,) and our_bps.shape == (FN,)
    _assert_close("full modal_spike bps", ref_bps, our_bps)
    _assert_close("full modal_spike r2", ref_r2, our_r2)
    for key in ref_res:
        _assert_close(f"full modal_spike result[{key}]",
                      ref_res[key], our_res[key])


@pytest.mark.slow
def test_oracle_full_shape_modal_behavior(shared_full, tmp_path):
    accelerator = types.SimpleNamespace(device=torch.device("cpu"))
    ref_res = shared_full["ref_eval"].co_smoothing_eval(
        shared_full["ref_model"], accelerator,
        [shared_full["torch_batch"]], shared_full["test_dataset"],
        save_plot=False, use_mtm=False,
        **_full_kwargs("modal_behavior", tmp_path / "ref"))

    from multi_modal_foundation_model_tpu.eval.harness import \
        co_smoothing_eval
    our_res = co_smoothing_eval(
        shared_full["flax_model"], shared_full["params"],
        [shared_full["np_batch"]], mode="modal_behavior", use_mtm=False,
        save_path=str(tmp_path / "ours"), method_name="oracle",
        is_aligned=True, target_regions=("all",), n_time_steps=FT,
        held_out_list=list(range(FT)), avail_beh=AVAIL_BEH,
        subtract="task", onset_alignment=[5])

    ref_d = ref_res["modal_behavior_behav_results"]
    our_d = our_res["modal_behavior_behav_results"]
    assert set(ref_d) == set(our_d)
    for key in ref_d:
        _assert_close(f"full modal_behavior {key}", ref_d[key], our_d[key])
