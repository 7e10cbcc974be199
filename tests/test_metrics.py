"""Metric golden tests: NLB bits-per-spike / NLL and R² machinery.

Hand-computed values + cross-checks against scipy/sklearn (SURVEY.md §4.1).
"""

import numpy as np
import pytest
from scipy.special import gammaln
from sklearn.metrics import r2_score as sk_r2

from multi_modal_foundation_model_tpu.eval import (
    bits_per_spike,
    compute_R2_main,
    compute_R2_psth,
    compute_all_psth,
    create_behavior_conditions,
    metrics_list,
    neg_log_likelihood,
    psth_and_trial_r2,
    r2_score_nanable,
)


def test_nll_hand_computed():
    rates = np.array([[1.0, 2.0]])
    spikes = np.array([[0.0, 3.0]])
    # nll = sum(r - n log r + log n!)
    expected = (1.0 - 0.0 + 0.0) + (2.0 - 3.0 * np.log(2.0) + np.log(6.0))
    assert np.isclose(neg_log_likelihood(rates, spikes), expected)


def test_nll_zero_rate_floored():
    rates = np.array([0.0, 1.0])
    spikes = np.array([1.0, 1.0])
    got = neg_log_likelihood(rates, spikes, zero_warning=False)
    expected = (1e-9 - np.log(1e-9)) + 1.0
    assert np.isclose(got, expected)


def test_nll_nan_spikes_dropped():
    rates = np.array([1.0, 5.0])
    spikes = np.array([1.0, np.nan])
    assert np.isclose(neg_log_likelihood(rates, spikes), 1.0)


def test_bits_per_spike_null_model_is_zero():
    rng = np.random.default_rng(0)
    spikes = rng.poisson(2.0, size=(10, 7, 3)).astype(float)
    null = np.tile(spikes.mean(axis=(0, 1), keepdims=True), (10, 7, 1))
    assert abs(bits_per_spike(null, spikes)) < 1e-12


def test_bits_per_spike_perfect_rates_positive():
    rng = np.random.default_rng(1)
    # time-varying rates: the true rates carry information the per-neuron
    # mean-rate null model lacks, so bps must be positive
    t = np.linspace(0, 2 * np.pi, 10)
    true_rates = 2.0 + np.sin(t)[None, :, None] * np.ones((20, 10, 5))
    spikes = rng.poisson(np.tile(true_rates, (25, 1, 1))).astype(float)
    true_rates = np.tile(true_rates, (25, 1, 1))
    assert bits_per_spike(true_rates, spikes) > 0.0
    # degrading the rates must reduce bps
    assert bits_per_spike(true_rates * 3.0, spikes) < bits_per_spike(true_rates, spikes)


def test_r2_matches_sklearn():
    rng = np.random.default_rng(2)
    y = rng.normal(size=50)
    p = y + rng.normal(scale=0.3, size=50)
    assert np.isclose(r2_score_nanable(y, p), sk_r2(y, p))


def test_r2_degenerate_is_nan():
    assert np.isnan(r2_score_nanable(np.ones(5), np.zeros(5)))
    assert r2_score_nanable(np.ones(5), np.ones(5)) == 1.0


def test_compute_R2_main_matches_sklearn_per_unit():
    rng = np.random.default_rng(3)
    y = rng.normal(size=(8, 10, 4))
    p = y + rng.normal(scale=0.5, size=(8, 10, 4))
    got = compute_R2_main(y, p, clip=False)
    want = np.array([sk_r2(y[..., n].ravel(), p[..., n].ravel()) for n in range(4)])
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_psth_pipeline():
    # 2 conditions (choice=±1), constant behavior per condition
    K, T = 12, 6
    choice = np.array([1.0, -1.0] * (K // 2))
    reward = np.ones(K)
    block = np.full(K, 0.5)
    X, var_name2idx, var_tasklist, _, _ = create_behavior_conditions(
        choice, reward, block, T=T)
    assert X.shape == (K, T, 3)

    y = np.where(choice[:, None] > 0, 1.0, 2.0) * np.ones((K, T))
    psth = compute_all_psth(X, y, var_name2idx["choice"])
    assert len(psth) == 2
    np.testing.assert_allclose(psth[(1.0,)], np.ones(T))
    np.testing.assert_allclose(psth[(-1.0,)], 2 * np.ones(T))

    # perfect prediction -> r2_psth 1, imperfect -> lower
    r2_psth, r2_trial = psth_and_trial_r2(X, y, y.copy(), var_tasklist, var_name2idx)
    assert np.isclose(r2_psth, 1.0) and np.isclose(r2_trial, 1.0)

    noisy = y + np.random.default_rng(0).normal(scale=0.2, size=y.shape)
    r2_psth2, r2_trial2 = psth_and_trial_r2(X, y, noisy, var_tasklist, var_name2idx)
    assert r2_psth2 < 1.0 and r2_trial2 < 1.0


def test_compute_R2_psth_clip():
    psth = {(0.0,): np.array([1.0, 2.0, 3.0])}
    bad = {(0.0,): np.array([10.0, -10.0, 0.0])}
    assert compute_R2_psth(psth, bad, clip=True) == 0.0


def test_metrics_list_r2_structure():
    rng = np.random.default_rng(4)
    gt = rng.normal(size=(5, 10, 3))
    out = metrics_list(gt, gt.copy(), metrics=["r2", "mse", "mae"])
    assert np.isclose(out["r2"], 1.0)
    assert out["mse"] == 0.0 and out["mae"] == 0.0

    pred = gt + rng.normal(scale=1.0, size=gt.shape)
    out2 = metrics_list(gt, pred, metrics=["r2"])
    assert out2["r2"] < 1.0
