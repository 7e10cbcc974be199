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


def plot_single_cell_psth(X, y, y_pred, var_tasklist, var_name2idx,
                          var_value2label=None, neuron_idx="",
                          neuron_region="", method="", r2_pair=None):
    """Per-task-variable PSTH traces, GT vs prediction — the figure half of
    the reference ``plot_psth``/``viz_single_cell``
    (``eval_utils.py:1164-1217,1348-1388``); metric math lives in
    eval/metrics.py. ``y``/``y_pred`` are (K, T) single-unit traces."""
    from ..eval.metrics import compute_all_psth

    ncols = len(var_tasklist)
    fig, axes = plt.subplots(1, ncols, figsize=(3 * ncols, 2.5),
                             squeeze=False)
    for ci, var in enumerate(var_tasklist):
        ax = axes[0][ci]
        psth_xy = compute_all_psth(X, y, var_name2idx[var])
        psth_pred_xy = compute_all_psth(X, y_pred, var_name2idx[var])
        for i, cond in enumerate(psth_xy):
            label = None
            if var_value2label and cond in var_value2label.get(var, {}):
                label = var_value2label[var][cond]
            color = plt.get_cmap("tab10")(i)
            ax.plot(psth_xy[cond], color=color, linewidth=3, alpha=0.3,
                    label=label or f"{var}: {cond[0]:.2f}")
            ax.plot(psth_pred_xy[cond], color=color, linestyle="--")
        ax.set_xlabel("Time bin")
        ax.set_title(var)
        ax.legend(fontsize=6)
        ax.spines[["right", "top"]].set_visible(False)
    title = f"Neuron #{neuron_idx} {neuron_region} {method}"
    if r2_pair is not None:
        title += f"  PSTH R2: {r2_pair[0]:.2f}  Trial R2: {r2_pair[1]:.2f}"
    axes[0][0].set_ylabel("Neural activity")
    fig.suptitle(title, fontsize=9)
    fig.tight_layout()
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
