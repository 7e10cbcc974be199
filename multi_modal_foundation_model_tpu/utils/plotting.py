"""Diagnostic figures (reference ``/root/reference/src/utils/utils.py:38-104``).

numpy-in instead of torch-tensor-in; figures are returned (callers save or
log them). matplotlib's Agg backend is forced so figures render headless.
"""

from __future__ import annotations

from typing import Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from ..eval.metrics import r2_score_nanable  # noqa: E402


def plot_gt_pred(gt: np.ndarray, pred: np.ndarray, epoch: int = 0,
                 modality: str = "behavior"):
    """Side-by-side ground-truth / prediction heatmaps."""
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 5))
    ax1.set_title("Ground Truth")
    im1 = ax1.imshow(np.asarray(gt), aspect="auto", cmap="binary")
    ax2.set_title("Prediction")
    im2 = ax2.imshow(np.asarray(pred), aspect="auto", cmap="binary")
    plt.colorbar(im1, ax=ax1)
    plt.colorbar(im2, ax=ax2)
    fig.suptitle(f"Epoch: {epoch}, Mod: {modality}")
    return fig


def plot_neurons_r2(gt: np.ndarray, pred: np.ndarray, epoch: int = 0,
                    neuron_idx: Sequence[int] = (), modality: str = "behavior"):
    """Per-neuron GT-vs-pred traces with R² annotations."""
    gt, pred = np.asarray(gt), np.asarray(pred)
    neuron_idx = list(neuron_idx)
    fig, axes = plt.subplots(len(neuron_idx), 1,
                             figsize=(12, 5 * len(neuron_idx)))
    r2_values = []
    for neuron in neuron_idx:
        r2 = r2_score_nanable(gt[:, neuron], pred[:, neuron])
        r2_values.append(r2)
        ax = axes if len(neuron_idx) == 1 else axes[neuron_idx.index(neuron)]
        ax.plot(gt[:, neuron], label="Ground Truth", color="blue")
        ax.plot(pred[:, neuron], label="Prediction", color="red")
        ax.set_title(f"Neuron: {neuron}, R2: {r2:.4f}")
        ax.legend()
        ax.set_xlabel("Time")
        ax.set_ylabel("Rate")
    fig.suptitle(f"Epoch: {epoch}, Mod: {modality}, "
                 f"Avg R2: {np.nanmean(r2_values):.4f}")
    return fig


def plot_condition_avg_r2(gt: np.ndarray, pred: np.ndarray, epoch: int = 0,
                          neuron_idx: int = 0, condition_idx: int = 0,
                          first_n: int = 8):
    """Condition-averaged single-neuron trace with trial-range band
    (reference ``plt_condition_avg_r2``)."""
    gt, pred = np.asarray(gt), np.asarray(pred)
    _, unique, _ = np.unique(gt, axis=0, return_inverse=True,
                             return_counts=True)
    trial_idx = (unique == condition_idx)
    first_n = min(first_n, int(trial_idx.sum()))
    gt_condition = gt[trial_idx][0, :, neuron_idx]
    pred_condition = pred[trial_idx][:first_n, :, neuron_idx]
    r2 = r2_score_nanable(gt_condition, pred_condition.mean(axis=0))
    fig, ax = plt.subplots()
    ax.plot(gt_condition, label="Ground Truth", color="blue")
    ax.plot(pred_condition.mean(axis=0), label="Prediction", color="red")
    ax.fill_between(np.arange(pred_condition.shape[1]),
                    pred_condition.min(axis=0), pred_condition.max(axis=0),
                    color="red", alpha=0.2)
    ax.set_title(f"R2: {r2:.4f}")
    ax.legend()
    ax.set_xlabel("Time")
    ax.set_ylabel("Rate")
    fig.suptitle(f"Epoch: {epoch}, Neuron: {neuron_idx}, "
                 f"Condition: {condition_idx}, Avg {first_n} trials")
    return fig
