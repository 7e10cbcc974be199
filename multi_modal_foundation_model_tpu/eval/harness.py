"""Co-smoothing eval harness: the six reference eval modes, vmapped on TPU.

Behavioral rebuild of ``co_smoothing_eval``
(``/root/reference/src/utils/eval_utils.py:93-757``). Structure of every
mode is "build static heldout masks -> forward -> per-neuron bps/R²"; the
reference runs the per-neuron and intra-region leave-one-out sweeps as O(N)
*sequential full-test-set forwards* (``eval_utils.py:149-195,451-538``).
Here each sweep is a channel-visibility matrix ``visible (V, N)`` driven
through ONE compiled forward via chunked ``vmap`` (+ ``lax.map`` over
chunks), gathering only each variant's target-neuron predictions — the
SURVEY.md §2.8 "biggest eval speedup opportunity".

Mode semantics (all masks via eval/heldout.py):

- ``per_neuron``     leave-one-neuron-out co-smoothing; bps + R² per neuron
- ``forward_pred``   timesteps ``held_out_list`` (70-99) held out
- ``inter_region``   per region: all its neurons held out, predicted from
                     the rest
- ``intra_region``   per region: LOO within the region, other regions fully
                     masked
- ``modal_spike``    all-timestep spike heldout, behavior visible (encoding)
- ``modal_behavior`` behavior held out, spikes visible (decoding); returns
                     per-covariate ``{beh}_r2_psth`` / ``{beh}_r2_trial``

``use_mtm=False`` reproduces the reference quirk that inputs stay unmasked
(only token-level zeroing via eval_mask applies) — all sweep variants then
share one forward, which this harness computes once instead of N times.

Artifact parity: ``bps.npy``/``r2.npy`` per mode + the
``{mode}_mean_bps`` / ``{mode}_mean_r2_psth`` / ``{mode}_mean_r2_trial``
result keys (``eval_utils.py:745-757``).

Known deviation: the reference's ``modal_behavior`` with ``use_mtm=True``
assigns the masked *behavior* tensor to the spike modality's inputs
(``eval_utils.py:680-684``), which cannot run (shape mismatch); here the
masked behavior goes to the behavior modality — the evident intent.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.multimodal import ModalityInput
from .heldout import heldout_mask
from .metrics import (bits_per_spike, create_behavior_conditions,
                      psth_and_trial_r2)


# ---------------------------------------------------------------------------
# compiled forwards
# ---------------------------------------------------------------------------

class EvalForward:
    """One jitted full-test-set forward + a chunked-vmap channel sweep.

    ``session_id`` (scalar) routes the forward through a session-stitched
    model's per-session tokenizer/head (``models/multimodal.py`` with
    ``n_sessions > 1``) — each session's test split is evaluated with its
    own stitched parameters, exactly as it trained. ``None`` keeps the
    single-session path."""

    def __init__(self, model, params, batch, chunk: int = 16,
                 session_id=None):
        self.model = model
        self.params = params
        self.chunk = chunk
        self.spikes = jnp.asarray(batch["spikes_data"])      # (K, T, N)
        self.behavior = jnp.asarray(batch["target"])         # (K, T, C)
        self.attn = jnp.asarray(batch["time_attn_mask"])
        self.ts = jnp.asarray(batch["spikes_timestamps"])
        self.session_id = (None if session_id is None
                           else jnp.asarray(session_id, jnp.int32))
        self._fwd = jax.jit(self._forward)
        self._sweep = None

    def _forward(self, ap_inputs, ap_eval, beh_inputs, beh_eval):
        mod_inputs = {
            "ap": ModalityInput(
                inputs=ap_inputs, targets=self.spikes,
                attn_mask=self.attn, timestamps=self.ts,
                eval_mask=ap_eval),
            "behavior": ModalityInput(
                inputs=beh_inputs, targets=self.behavior,
                attn_mask=self.attn, timestamps=self.ts,
                eval_mask=beh_eval),
        }
        out = self.model.apply({"params": self.params}, mod_inputs,
                               training=False, session_id=self.session_id)
        return out.mod_preds["ap"], out.mod_preds["behavior"]

    # -- single forward ---------------------------------------------------

    def forward(self, ap_inputs=None, ap_eval=None, beh_inputs=None,
                beh_eval=None) -> Tuple[np.ndarray, np.ndarray]:
        """Full-set forward; None masks default to zeros (nothing held)."""
        ap_inputs = self.spikes if ap_inputs is None else jnp.asarray(ap_inputs)
        beh_inputs = (self.behavior if beh_inputs is None
                      else jnp.asarray(beh_inputs))
        ap_eval = (jnp.zeros_like(self.spikes, dtype=jnp.int32)
                   if ap_eval is None else jnp.asarray(ap_eval, jnp.int32))
        beh_eval = (jnp.zeros_like(self.behavior, dtype=jnp.int32)
                    if beh_eval is None else jnp.asarray(beh_eval, jnp.int32))
        ap_preds, beh_preds = self._fwd(ap_inputs, ap_eval, beh_inputs,
                                        beh_eval)
        return np.asarray(ap_preds), np.asarray(beh_preds)

    # -- channel-visibility sweep ------------------------------------------

    def sweep(self, visible: np.ndarray, target_idx: np.ndarray,
              use_mtm: bool) -> np.ndarray:
        """Per-variant spike predictions at each variant's target neuron.

        ``visible (V, N)``: per-variant channel visibility (0 = held out).
        ``target_idx (V,)``: the neuron whose predictions to return.
        Returns ``(V, K, T)`` predicted log-rates.

        With ``use_mtm=False`` the model inputs don't vary across variants
        (reference parity — only eval_mask varies, and for channel heldouts
        eval_mask feeds nothing but column 0 of the token mask), so one
        forward serves every variant whose ``visible[:, 0]`` agrees.
        """
        visible = np.asarray(visible, dtype=np.float32)
        target_idx = np.asarray(target_idx, dtype=np.int32)

        if not use_mtm:
            # variants differ only via eval_mask[:, :, 0] (token zeroing)
            out = np.empty((len(visible),) + self.spikes.shape[:2],
                           dtype=np.float32)
            for col0 in np.unique(visible[:, 0]):
                rows = np.where(visible[:, 0] == col0)[0]
                ap_eval = np.broadcast_to(
                    (1.0 - visible[rows[0]]).astype(np.int32),
                    self.spikes.shape)
                ap_preds, _ = self.forward(ap_eval=ap_eval)
                out[rows] = ap_preds[:, :, target_idx[rows]].transpose(2, 0, 1)
            return out

        if self._sweep is None:
            def one(vis_row, tgt):
                ap_inputs = self.spikes * vis_row[None, None, :]
                ap_eval = jnp.broadcast_to(
                    (1.0 - vis_row).astype(jnp.int32)[None, None, :],
                    self.spikes.shape)
                ap_preds, _ = self._forward(
                    ap_inputs, ap_eval, self.behavior,
                    jnp.zeros_like(self.behavior, dtype=jnp.int32))
                return ap_preds[:, :, tgt]                    # (K, T)

            batched = jax.vmap(one)

            @jax.jit
            def sweep_chunks(vis, tgt):                       # (G, c, N), (G, c)
                return jax.lax.map(lambda args: batched(*args), (vis, tgt))

            self._sweep = sweep_chunks

        V = len(visible)
        c = min(self.chunk, V)
        pad = (-V) % c
        vis_p = np.concatenate([visible, np.repeat(visible[-1:], pad, 0)], 0)
        tgt_p = np.concatenate([target_idx,
                                np.repeat(target_idx[-1:], pad, 0)], 0)
        G = len(vis_p) // c
        out = self._sweep(vis_p.reshape(G, c, -1), tgt_p.reshape(G, c))
        out = np.asarray(out).reshape(G * c, *self.spikes.shape[:2])
        return out[:V]


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

def _first_batch(test_dataloader):
    for batch in test_dataloader:
        return batch
    raise ValueError("empty test loader")


def _real_n(batch) -> int:
    space = np.asarray(batch["space_attn_mask"][0])
    zeros = np.nonzero(space == 0)[0]
    return int(zeros.min()) if len(zeros) else space.shape[-1]


def co_smoothing_eval(
    model,
    params,
    test_dataloader,
    mode: str = "per_neuron",
    *,
    use_mtm: bool = False,
    save_path: str = "eval_results",
    method_name: str = "mm",
    is_aligned: bool = True,
    target_regions: Sequence[str] = ("all",),
    n_time_steps: int = 100,
    held_out_list: Optional[Sequence[int]] = None,
    avail_beh: Sequence[str] = ("wheel-speed", "whisker-motion-energy"),
    subtract: str = "task",
    onset_alignment: Sequence[int] = (40,),
    chunk: int = 16,
    save_plot: bool = False,
    max_plots: int = 20,
    session_id=None,
) -> Dict[str, Any]:
    """Run one eval mode over the full test split; returns the metric dict
    and saves ``bps.npy``/``r2.npy`` under ``save_path``.

    ``session_id``: scalar stitched-parameter index for session-stitched
    (``n_sessions > 1``) models — required there, ignored otherwise. The
    reference applies this instrument to every model it trains
    (``eval_utils.py:37-83``); this argument extends it to the stitched
    multi-session flagship, one session per call."""
    batch = _first_batch(test_dataloader)
    T = n_time_steps
    N = _real_n(batch)
    region_list = np.asarray(batch["neuron_regions"])[:N].astype(str)
    spikes = np.asarray(batch["spikes_data"])
    behavior = np.asarray(batch["target"])

    if is_aligned:
        X, var_name2idx, var_tasklist, _, _ = create_behavior_conditions(
            batch["choice"], batch["reward"], batch["block"], T=T)
    else:
        X = var_name2idx = var_tasklist = None

    fwd = EvalForward(model, params, batch, chunk=chunk,
                      session_id=session_id)
    N_total = spikes.shape[-1]

    n_plotted = [0]

    def _r2_pair(y, y_pred, t_idx=None, neuron=None) -> np.ndarray:
        if not is_aligned:
            from .metrics import r2_score_nanable
            r2 = r2_score_nanable(y, y_pred)
            if save_plot and neuron is not None and n_plotted[0] < max_plots:
                import matplotlib.pyplot as plt

                from ..utils.plotting import viz_single_cell_unaligned_figure
                os.makedirs(save_path, exist_ok=True)
                region = (region_list[neuron].replace("/", "-")
                          if neuron < len(region_list) else "pad")
                fig = viz_single_cell_unaligned_figure(
                    y, y_pred, neuron_idx=neuron, neuron_region=region,
                    method=method_name, r2=r2)
                fig.savefig(os.path.join(
                    save_path, f"{region}_{neuron}_{r2:.2f}_{method_name}.png"))
                plt.close(fig)
                n_plotted[0] += 1
            return np.array([np.nan, r2])
        Xc = X if t_idx is None else X[:, t_idx, :]
        r2_psth, r2_trial = psth_and_trial_r2(
            Xc, y, y_pred, var_tasklist, var_name2idx)
        pair = np.array([r2_psth, r2_trial])
        if save_plot and neuron is not None and n_plotted[0] < max_plots:
            # per-neuron PSTH figure named like the reference
            # (``eval_utils.py:1385``: {region}_{id}_{r2:.2f}_{method}.png)
            import matplotlib.pyplot as plt

            from ..utils.plotting import viz_single_cell_figure
            os.makedirs(save_path, exist_ok=True)
            region = (region_list[neuron].replace("/", "-")
                      if neuron < len(region_list) else "pad")
            # full reference viz_single_cell layout: PSTH row + PSTH-
            # subtracted obs/pred/residual single-trial rasters
            # (eval_utils.py:1348-1388)
            fig = viz_single_cell_figure(
                Xc, y, y_pred, var_tasklist, var_name2idx,
                neuron_idx=neuron, neuron_region=region,
                method=method_name, r2_pair=pair)
            fig.savefig(os.path.join(
                save_path, f"{region}_{neuron}_{r2_trial:.2f}_{method_name}.png"))
            plt.close(fig)
            n_plotted[0] += 1
        return pair

    bps_result_list = [float("nan")] * N
    r2_result_list = [np.array([np.nan, np.nan])] * N

    if mode == "per_neuron":
        visible = np.ones((N, N_total), dtype=np.float32)
        visible[np.arange(N), np.arange(N)] = 0.0
        preds_at = fwd.sweep(visible, np.arange(N), use_mtm)  # (N, K, T)
        for n_i in range(N):
            gt_n = spikes[:, :, n_i]
            pr_n = np.exp(preds_at[n_i])
            bps = bits_per_spike(pr_n[:, :, None], gt_n[:, :, None])
            bps_result_list[n_i] = np.nan if np.isinf(bps) else bps
            r2_result_list[n_i] = _r2_pair(gt_n, pr_n, neuron=n_i)

    elif mode == "forward_pred" or mode == "modal_spike":
        assert held_out_list is not None, \
            f"{mode} requires specific target time points to predict"
        hd = np.asarray(held_out_list)
        mask_result = heldout_mask(spikes, mode=mode, heldout_idxs=hd)
        ap_inputs = mask_result["spikes"] if use_mtm else None
        ap_preds, _ = fwd.forward(ap_inputs=ap_inputs,
                                  ap_eval=mask_result["eval_mask"])
        preds = np.exp(ap_preds[:, :, :N])
        gt = spikes[:, :, :N]
        for n_i in range(N):
            bps = bits_per_spike(preds[:, hd][:, :, [n_i]],
                                 gt[:, hd][:, :, [n_i]])
            bps_result_list[n_i] = np.nan if np.isinf(bps) else bps
            r2_result_list[n_i] = _r2_pair(gt[:, hd, n_i],
                                           preds[:, hd, n_i], t_idx=hd,
                                           neuron=n_i)

    elif mode == "inter_region":
        assert held_out_list is None, \
            "inter_region does LOO for all neurons in the target region"
        regions = (list(np.unique(region_list)) if "all" in target_regions
                   else list(target_regions))
        for region in regions:
            region_idxs = np.argwhere(region_list == region).flatten()
            mask_result = heldout_mask(
                spikes, mode="inter_region",
                heldout_idxs=np.arange(len(region_idxs)),
                target_regions=[region], neuron_regions=region_list)
            ap_inputs = mask_result["spikes"] if use_mtm else None
            ap_preds, _ = fwd.forward(ap_inputs=ap_inputs,
                                      ap_eval=mask_result["eval_mask"])
            preds = np.exp(ap_preds[:, :, :N])
            for n_i in mask_result["heldout_idxs"]:
                bps = bits_per_spike(preds[:, :, [n_i]], spikes[:, :, [n_i]])
                bps_result_list[n_i] = np.nan if np.isinf(bps) else bps
                r2_result_list[n_i] = _r2_pair(spikes[:, :, n_i],
                                               preds[:, :, n_i], neuron=n_i)

    elif mode == "intra_region":
        assert held_out_list is None, \
            "intra_region does LOO for all neurons in the target region"
        regions = (list(np.unique(region_list)) if "all" in target_regions
                   else list(target_regions))
        vis_rows, tgt_rows = [], []
        for region in regions:
            region_idxs = np.argwhere(region_list == region).flatten()
            for tgt in region_idxs:
                vis = np.zeros(N_total, dtype=np.float32)
                vis[region_idxs] = 1.0
                vis[tgt] = 0.0
                vis_rows.append(vis)
                tgt_rows.append(tgt)
        visible = np.stack(vis_rows)
        targets = np.asarray(tgt_rows)
        preds_at = fwd.sweep(visible, targets, use_mtm)       # (V, K, T)
        for v, n_i in enumerate(targets):
            gt_n = spikes[:, :, n_i]
            pr_n = np.exp(preds_at[v])
            bps = bits_per_spike(pr_n[:, :, None], gt_n[:, :, None])
            bps_result_list[n_i] = np.nan if np.isinf(bps) else bps
            r2_result_list[n_i] = _r2_pair(gt_n, pr_n, neuron=int(n_i))

    elif mode == "modal_behavior":
        N_beh = len(avail_beh)
        assert held_out_list is not None, \
            "modal_behavior requires target time points"
        hd = np.asarray(held_out_list)
        mask_result = heldout_mask(behavior, mode=mode, heldout_idxs=hd)
        beh_inputs = mask_result["spikes"] if use_mtm else None
        _, beh_preds = fwd.forward(
            beh_inputs=beh_inputs, beh_eval=mask_result["eval_mask"])
        gt = behavior[:, :, :N_beh]
        preds = beh_preds[:, :, :N_beh]
        behav_results: Dict[str, float] = {}
        for i in range(N_beh):
            pair = _r2_pair(gt[:, hd, i], preds[:, hd, i], t_idx=hd)
            behav_results[f"{avail_beh[i]}_r2_psth"] = float(pair[0])
            behav_results[f"{avail_beh[i]}_r2_trial"] = float(pair[1])
        os.makedirs(save_path, exist_ok=True)
        np.save(os.path.join(save_path, "r2.npy"), behav_results)
        np.save(os.path.join(save_path, "bps.npy"), np.nan)
        return {f"{mode}_behav_results": behav_results}

    else:
        raise NotImplementedError("mode not implemented")

    os.makedirs(save_path, exist_ok=True)
    bps_all = np.array(bps_result_list)
    r2_all = np.array(r2_result_list)
    np.save(os.path.join(save_path, "bps.npy"), bps_all)
    np.save(os.path.join(save_path, "r2.npy"), r2_all)
    return {
        f"{mode}_mean_bps": _nanmean(bps_all),
        f"{mode}_mean_r2_psth": _nanmean(r2_all[:, 0]),
        f"{mode}_mean_r2_trial": _nanmean(r2_all[:, 1]),
    }


def _nanmean(a: np.ndarray) -> float:
    """nanmean that returns NaN silently on an all-NaN column (the unaligned
    path legitimately produces ones — e.g. every neuron's PSTH R² undefined
    when no trial conditions exist) instead of numpy's RuntimeWarning."""
    a = np.asarray(a, dtype=np.float64)
    keep = ~np.isnan(a)
    if not keep.any():
        return float("nan")
    return float(a[keep].mean())
