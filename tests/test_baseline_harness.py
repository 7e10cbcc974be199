"""Baseline eval harness: modal_spike / modal_behavior metrics, artifact
layout, min-shift quirk, and per-neuron diagnostic figures (reference
``eval_baseline_utils.py:82-291``)."""

import glob

import numpy as np
import pytest

from multi_modal_foundation_model_tpu.data.loader import make_loader
from multi_modal_foundation_model_tpu.data.session import synthetic_splits
from multi_modal_foundation_model_tpu.eval.baseline_harness import \
    co_smoothing_eval_baseline
from multi_modal_foundation_model_tpu.models.baseline import (
    BaselineDecoder, BaselineEncoder)
from multi_modal_foundation_model_tpu.train import (
    BaselineTrainer, OptimizerConfig, TrainerConfig)

N, T = 24, 20


@pytest.fixture(scope="module")
def session():
    return synthetic_splits(seed=0, n_trials=64, n_neurons=N, n_timesteps=T)


def _trained(session, direction, tmpdir):
    train, val = (make_loader(s, batch_size=16, max_time_length=T,
                              max_space_length=N)
                  for s in (session.train, session.val))
    if direction == "encoding":
        model = BaselineEncoder(in_channel=2, out_channel=N, seq_len=T)
        mf = {"input": ["behavior"], "output": ["ap"]}
    else:
        model = BaselineDecoder(in_channel=N, out_channel=2)
        mf = {"input": ["ap"], "output": ["behavior"]}
    tr = BaselineTrainer(model, train, val, OptimizerConfig(lr=1e-3),
                         TrainerConfig(num_epochs=2, log_dir=tmpdir, seed=0),
                         modal_filter=mf)
    tr.train()
    return model, tr.state.params, mf


def _test_loader(session):
    return make_loader(session.test, batch_size=session.test.n_trials,
                       max_time_length=T, max_space_length=N, shuffle=False)


def test_modal_spike_with_figures(session, tmp_path):
    model, params, mf = _trained(session, "encoding", str(tmp_path / "tr"))
    save = str(tmp_path / "ms")
    res = co_smoothing_eval_baseline(
        model, params, _test_loader(session), "modal_spike",
        modal_filter=mf, save_path=save, held_out_list=list(range(T)),
        n_time_steps=T, save_plot=True, max_plots=2)
    assert np.isfinite(res["modal_spike_mean_bps"])
    assert np.isfinite(res["modal_spike_mean_r2_trial"])
    assert np.load(f"{save}/bps.npy").shape == (N,)
    assert np.load(f"{save}/r2.npy").shape == (N, 2)
    figs = glob.glob(f"{save}/*.png")
    assert len(figs) == 2, figs


def test_modal_behavior(session, tmp_path):
    model, params, mf = _trained(session, "decoding", str(tmp_path / "tr"))
    res = co_smoothing_eval_baseline(
        model, params, _test_loader(session), "modal_behavior",
        modal_filter=mf, save_path=str(tmp_path / "mb"),
        held_out_list=list(range(T)), n_time_steps=T)
    br = res["modal_behavior_behav_results"]
    for beh in ("wheel-speed", "whisker-motion-energy"):
        assert np.isfinite(br[f"{beh}_r2_trial"])
        assert np.isfinite(br[f"{beh}_r2_psth"])
