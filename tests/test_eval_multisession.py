"""Multi-session co-smoothing harness tests: the session-stitched flagship
model driven through the full six-mode eval instrument (VERDICT r4 ask #1).

Covers the eval-side contract of multi-session training: a stitched
checkpoint + sessions.json sidecar reload via
``load_multisession_model_data_local``, each session scored with its own
``session_id`` through ``co_smoothing_eval``, artifacts landing per
session. The reference applies its instrument to every model it trains
(``/root/reference/src/utils/eval_utils.py:37-83``); stitching is
framework-new, so these tests pin the extension's semantics.
"""

import json
import os

import numpy as np
import pytest

from multi_modal_foundation_model_tpu.data.session import synthetic_splits
from multi_modal_foundation_model_tpu.eval import (
    co_smoothing_eval, load_model_data_local,
    load_multisession_model_data_local)
from multi_modal_foundation_model_tpu.models.multimodal import (
    MultiModal, MultiModalConfig)
from multi_modal_foundation_model_tpu.ops.masking import (MaskParams,
                                                          RegionTable)
from multi_modal_foundation_model_tpu.train import (
    MultiSessionTrainer, OptimizerConfig, TrainerConfig,
    build_multisession_loaders)

T = 20


def _sessions():
    return {
        "ms_a": synthetic_splits(seed=11, n_trials=48, n_neurons=20,
                                 n_timesteps=T, eid="ms_a"),
        "ms_b": synthetic_splits(seed=12, n_trials=48, n_neurons=28,
                                 n_timesteps=T, eid="ms_b"),
    }


@pytest.fixture(scope="module")
def stitched_ckpt(tmp_path_factory):
    """A briefly-trained 2-session stitched checkpoint with both sidecars
    (model_config.json from the trainer, sessions.json as the entry script
    writes it)."""
    logdir = str(tmp_path_factory.mktemp("ms_ckpt"))
    sessions = _sessions()
    train, val, _, meta = build_multisession_loaders(
        sessions, batch_size=16, max_time_length=T, pad_multiple=32)
    table = RegionTable.build(meta["per_session_region_ids"],
                              region_vocab=meta["region_vocab"])
    model = MultiModal(MultiModalConfig(
        n_channels={"ap": meta["n_max"], "behavior": 2}, max_F=T,
        hidden_size=32, n_enc_layers=1, n_dec_layers=1, n_heads=2,
        inter_size=64, dropout=0.1, embed_dropout=0.1,
        mask_params=MaskParams(ratio=0.3), attn_impl="xla",
        n_sessions=len(meta["eids"])))
    tr = MultiSessionTrainer(
        model, train, val, OptimizerConfig(lr=1e-3, wd=0.01),
        TrainerConfig(num_epochs=2, log_dir=logdir, seed=0),
        region_table=table, eid_to_sid=meta["eid_to_sid"])
    tr.train()
    with open(os.path.join(logdir, "sessions.json"), "w") as f:
        json.dump({"eids": meta["eids"],
                   "num_neurons": meta["num_neurons"],
                   "n_max": meta["n_max"]}, f)
    return logdir, sessions, meta


def test_load_multisession_checkpoint(stitched_ckpt):
    logdir, sessions, meta = stitched_ckpt
    model, params, loaders, eid_to_sid = load_multisession_model_data_local(
        model_dir=logdir,
        test_sessions={e: s.test for e, s in sessions.items()},
        max_time_length=T)
    assert model.config.n_sessions == 2
    assert model.config.mask_params.ratio == 0.0   # masker disabled at eval
    assert eid_to_sid == meta["eid_to_sid"]
    for eid, loader in loaders.items():
        # every session padded to the checkpoint's trained width
        assert loader.arrays["spikes_data"].shape[2] == meta["n_max"]
        assert (loader.arrays["space_attn_mask"][0].sum()
                == sessions[eid].n_neurons)


def test_load_multisession_rejects_single_session(tmp_path, stitched_ckpt):
    """A single-session checkpoint must not silently load down this path."""
    logdir, sessions, _ = stitched_ckpt
    import shutil

    from multi_modal_foundation_model_tpu.eval.loading import (
        load_model_config, save_model_config)
    import dataclasses
    single = str(tmp_path / "single")
    shutil.copytree(logdir, single)
    cfg = dataclasses.replace(load_model_config(single), n_sessions=1)
    save_model_config(single, cfg)
    with pytest.raises(ValueError, match="single-session"):
        load_multisession_model_data_local(
            model_dir=single,
            test_sessions={e: s.test for e, s in sessions.items()},
            max_time_length=T)


def test_load_multisession_rejects_unknown_eid(stitched_ckpt):
    logdir, sessions, _ = stitched_ckpt
    bogus = synthetic_splits(seed=99, n_trials=8, n_neurons=8,
                             n_timesteps=T, eid="nope")
    with pytest.raises(ValueError, match="not in the checkpoint"):
        load_multisession_model_data_local(
            model_dir=logdir, test_sessions={"nope": bogus.test},
            max_time_length=T)


@pytest.mark.parametrize("mode,kw", [
    ("per_neuron", {}),
    ("forward_pred", {"held_out_list": list(range(int(0.7 * T), T))}),
    ("inter_region", {}),
    ("intra_region", {}),
    ("modal_spike", {"held_out_list": list(range(T))}),
])
def test_stitched_spike_modes_per_session(stitched_ckpt, tmp_path, mode, kw):
    """All five spike modes run per session on the stitched model and
    produce per-real-neuron artifacts."""
    logdir, sessions, meta = stitched_ckpt
    model, params, loaders, eid_to_sid = load_multisession_model_data_local(
        model_dir=logdir,
        test_sessions={e: s.test for e, s in sessions.items()},
        max_time_length=T)
    for eid, loader in loaders.items():
        save_path = str(tmp_path / eid / mode)
        res = co_smoothing_eval(
            model, params, loader, mode=mode, use_mtm=True,
            save_path=save_path, n_time_steps=T,
            session_id=eid_to_sid[eid], **kw)
        bps = np.load(os.path.join(save_path, "bps.npy"))
        r2 = np.load(os.path.join(save_path, "r2.npy"))
        n_real = sessions[eid].n_neurons
        assert bps.shape == (n_real,)
        assert r2.shape == (n_real, 2)
        assert np.isfinite(bps).any()
        assert np.isfinite(res[f"{mode}_mean_bps"])


def test_stitched_modal_behavior_per_session(stitched_ckpt, tmp_path):
    logdir, sessions, meta = stitched_ckpt
    model, params, loaders, eid_to_sid = load_multisession_model_data_local(
        model_dir=logdir,
        test_sessions={e: s.test for e, s in sessions.items()},
        max_time_length=T)
    for eid, loader in loaders.items():
        res = co_smoothing_eval(
            model, params, loader, mode="modal_behavior", use_mtm=True,
            save_path=str(tmp_path / eid / "modal_behavior"),
            n_time_steps=T, held_out_list=list(range(T)),
            session_id=eid_to_sid[eid])
        beh = res["modal_behavior_behav_results"]
        for cov in ("wheel-speed", "whisker-motion-energy"):
            assert np.isfinite(beh[f"{cov}_r2_trial"])


def test_stitched_sessions_score_with_their_own_params(stitched_ckpt,
                                                       tmp_path):
    """The session_id actually routes: scoring one session's data under the
    OTHER session's stitched params must change the predictions (else the
    harness silently ignores the id)."""
    logdir, sessions, _ = stitched_ckpt
    model, params, loaders, eid_to_sid = load_multisession_model_data_local(
        model_dir=logdir,
        test_sessions={e: s.test for e, s in sessions.items()},
        max_time_length=T)
    eid = "ms_a"
    loader = loaders[eid]
    outs = []
    for sid in (0, 1):
        res = co_smoothing_eval(
            model, params, loader, mode="modal_spike", use_mtm=True,
            save_path=str(tmp_path / f"sid{sid}"), n_time_steps=T,
            held_out_list=list(range(T)), session_id=sid)
        outs.append(np.load(str(tmp_path / f"sid{sid}" / "bps.npy")))
    assert not np.allclose(outs[0], outs[1])


def test_single_session_harness_unaffected(stitched_ckpt, tmp_path_factory):
    """Regression: session_id=None keeps the single-session path working
    (uses the existing single-session checkpoint contract)."""
    logdir = str(tmp_path_factory.mktemp("ss_ckpt"))
    splits = synthetic_splits(seed=0, n_trials=32, n_neurons=16,
                              n_timesteps=T)
    from multi_modal_foundation_model_tpu.data.loader import make_loader
    from multi_modal_foundation_model_tpu.train import MultiModalTrainer
    kw = dict(batch_size=16, max_time_length=T, max_space_length=16)
    train = make_loader(splits.train, **kw)
    model = MultiModal(MultiModalConfig(
        n_channels={"ap": 16, "behavior": 2}, max_F=T,
        hidden_size=32, n_enc_layers=1, n_dec_layers=1, n_heads=2,
        inter_size=64, dropout=0.1, embed_dropout=0.1,
        mask_params=MaskParams(ratio=0.3), attn_impl="xla"))
    tr = MultiModalTrainer(
        model, train, None, OptimizerConfig(lr=1e-3, wd=0.01),
        TrainerConfig(num_epochs=1, log_dir=logdir, seed=0))
    tr.train()
    model, params, loader = load_model_data_local(
        model_dir=logdir, test_session=splits.test, max_time_length=T,
        max_space_length=16, checkpoint_name="last")
    res = co_smoothing_eval(
        model, params, loader, mode="modal_spike", use_mtm=True,
        save_path=str(tmp_path_factory.mktemp("ss_out")), n_time_steps=T,
        held_out_list=list(range(T)))
    assert np.isfinite(res["modal_spike_mean_bps"])
