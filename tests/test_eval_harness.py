"""Eval-harness tests: heldout-mask parity, all six co-smoothing modes,
vmapped-sweep == sequential-forward equivalence, checkpoint reload."""

import numpy as np
import pytest

from multi_modal_foundation_model_tpu.data.loader import make_loader
from multi_modal_foundation_model_tpu.data.session import synthetic_splits
from multi_modal_foundation_model_tpu.eval import (
    EvalForward, co_smoothing_eval, heldout_mask, load_model_data_local)
from multi_modal_foundation_model_tpu.models.multimodal import (
    MultiModal, MultiModalConfig)
from multi_modal_foundation_model_tpu.ops.masking import MaskParams
from multi_modal_foundation_model_tpu.train import (
    MultiModalTrainer, OptimizerConfig, TrainerConfig)

N_NEURONS, T = 24, 20


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """A briefly-trained tiny model + test loader + checkpoint dir."""
    logdir = str(tmp_path_factory.mktemp("ckpt"))
    splits = synthetic_splits(seed=0, n_trials=64, n_neurons=N_NEURONS,
                              n_timesteps=T)
    kw = dict(batch_size=16, max_time_length=T, max_space_length=N_NEURONS)
    train = make_loader(splits.train, **kw)
    val = make_loader(splits.val, shuffle=False, **kw)
    model = MultiModal(MultiModalConfig(
        n_channels={"ap": N_NEURONS, "behavior": 2}, max_F=T,
        hidden_size=32, n_enc_layers=1, n_dec_layers=1, n_heads=2,
        inter_size=64, dropout=0.1, embed_dropout=0.1,
        mask_params=MaskParams(ratio=0.3), attn_impl="xla"))
    tr = MultiModalTrainer(
        model, train, val, OptimizerConfig(lr=1e-3, wd=0.01),
        TrainerConfig(num_epochs=2, log_dir=logdir, seed=0))
    tr.train()
    return logdir, splits


# ---------------------------------------------------------------------------
# heldout_mask parity (reference eval_utils.py:988-1045)
# ---------------------------------------------------------------------------

def test_heldout_mask_manual_and_most():
    spikes = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    r = heldout_mask(spikes, mode="manual", heldout_idxs=np.array([1]))
    assert (r["spikes"][:, :, 1] == 0).all()
    assert (r["eval_mask"][:, :, 1] == 1).all()
    assert (r["eval_mask"][:, :, [0, 2, 3]] == 0).all()

    r = heldout_mask(spikes, mode="most", n_active=2)
    held = np.where(r["eval_mask"][0, 0] == 1)[0]
    means = spikes.mean((0, 1))
    assert set(held) == set(np.argsort(means)[-2:])


def test_heldout_mask_regions():
    spikes = np.ones((2, 3, 6), np.float32)
    regions = np.array(["A", "A", "B", "B", "C", "C"])
    r = heldout_mask(spikes, mode="inter_region",
                     heldout_idxs=np.arange(2),
                     target_regions=["B"], neuron_regions=regions)
    assert (r["eval_mask"][:, :, [2, 3]] == 1).all()
    assert (r["eval_mask"][:, :, [0, 1, 4, 5]] == 0).all()
    np.testing.assert_array_equal(r["heldout_idxs"], [2, 3])

    r = heldout_mask(spikes, mode="intra_region",
                     heldout_idxs=np.array([0]),
                     target_regions=["B"], neuron_regions=regions)
    # outside the region everything is held out; inside, neuron 2 (local 0)
    assert (r["eval_mask"][:, :, [0, 1, 4, 5]] == 1).all()
    assert (r["eval_mask"][:, :, 2] == 1).all()
    assert (r["eval_mask"][:, :, 3] == 0).all()


def test_heldout_mask_timesteps():
    spikes = np.ones((2, 5, 3), np.float32)
    r = heldout_mask(spikes, mode="forward_pred",
                     heldout_idxs=np.array([3, 4]))
    assert (r["eval_mask"][:, [3, 4]] == 1).all()
    assert (r["eval_mask"][:, :3] == 0).all()


# ---------------------------------------------------------------------------
# sweep == sequential forwards
# ---------------------------------------------------------------------------

def test_sweep_matches_sequential(trained):
    logdir, splits = trained
    model, params, loader = load_model_data_local(
        model_dir=logdir, test_session=splits.test,
        max_time_length=T, max_space_length=N_NEURONS)
    batch = next(iter(loader))
    fwd = EvalForward(model, params, batch, chunk=4)

    visible = np.ones((5, N_NEURONS), np.float32)
    for i in range(5):
        visible[i, i] = 0.0
    targets = np.arange(5)

    swept = fwd.sweep(visible, targets, use_mtm=True)
    for i in range(5):
        spikes = np.asarray(batch["spikes_data"])
        ap_inputs = spikes * visible[i][None, None, :]
        ap_eval = np.broadcast_to(
            (1 - visible[i]).astype(np.int32), spikes.shape)
        ap_preds, _ = fwd.forward(ap_inputs=ap_inputs, ap_eval=ap_eval)
        np.testing.assert_allclose(swept[i], ap_preds[:, :, i],
                                   rtol=2e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# all six modes produce finite metrics + artifacts
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode,kw", [
    ("per_neuron", {}),
    ("per_neuron", {"use_mtm": True, "save_plot": True, "max_plots": 2}),
    ("forward_pred", {"held_out_list": list(range(T - 5, T))}),
    ("inter_region", {}),
    ("intra_region", {"use_mtm": True}),
    ("modal_spike", {"held_out_list": list(range(T))}),
])
def test_co_smoothing_modes(trained, tmp_path, mode, kw):
    logdir, splits = trained
    model, params, loader = load_model_data_local(
        model_dir=logdir, test_session=splits.test,
        max_time_length=T, max_space_length=N_NEURONS)
    save_path = str(tmp_path / mode)
    res = co_smoothing_eval(model, params, loader, mode=mode,
                            save_path=save_path, n_time_steps=T, **kw)
    assert np.isfinite(res[f"{mode}_mean_bps"]) or np.isnan(
        res[f"{mode}_mean_bps"])
    assert np.isfinite(res[f"{mode}_mean_r2_trial"])
    bps = np.load(f"{save_path}/bps.npy")
    r2 = np.load(f"{save_path}/r2.npy")
    assert bps.shape == (N_NEURONS,)
    assert r2.shape == (N_NEURONS, 2)


def test_modal_behavior_mode(trained, tmp_path):
    logdir, splits = trained
    model, params, loader = load_model_data_local(
        model_dir=logdir, test_session=splits.test,
        max_time_length=T, max_space_length=N_NEURONS)
    res = co_smoothing_eval(
        model, params, loader, mode="modal_behavior",
        save_path=str(tmp_path / "mb"), n_time_steps=T,
        held_out_list=list(range(T)))
    br = res["modal_behavior_behav_results"]
    for beh in ("wheel-speed", "whisker-motion-energy"):
        assert np.isfinite(br[f"{beh}_r2_trial"])
        assert np.isfinite(br[f"{beh}_r2_psth"])


def test_unaligned_eval_end_to_end(trained, tmp_path):
    """The unaligned path (--unaligned on eval_multi_modal): is_aligned=
    False through per_neuron + modal_behavior — plain trial R² (PSTH slot
    NaN), unaligned raster figures on disk, artifact shapes intact
    (reference drives this via its unaligned datasets,
    eval_utils.py:1392-1459)."""
    import glob
    logdir, splits = trained
    model, params, loader = load_model_data_local(
        model_dir=logdir, test_session=splits.test,
        max_time_length=T, max_space_length=N_NEURONS)

    save_path = str(tmp_path / "ual_pn")
    res = co_smoothing_eval(
        model, params, loader, mode="per_neuron", is_aligned=False,
        save_path=save_path, n_time_steps=T, save_plot=True, max_plots=2)
    assert np.isfinite(res["per_neuron_mean_r2_trial"])
    assert np.isnan(res["per_neuron_mean_r2_psth"])  # no PSTH unaligned
    r2 = np.load(f"{save_path}/r2.npy")
    assert r2.shape == (N_NEURONS, 2)
    assert np.isnan(r2[:, 0]).all() and np.isfinite(r2[:, 1]).any()
    figs = glob.glob(f"{save_path}/*.png")
    assert len(figs) == 2  # unaligned raster figures

    res = co_smoothing_eval(
        model, params, loader, mode="modal_behavior", is_aligned=False,
        save_path=str(tmp_path / "ual_mb"), n_time_steps=T,
        held_out_list=list(range(T)))
    br = res["modal_behavior_behav_results"]
    for beh in ("wheel-speed", "whisker-motion-energy"):
        assert np.isfinite(br[f"{beh}_r2_trial"])
        assert np.isnan(br[f"{beh}_r2_psth"])
