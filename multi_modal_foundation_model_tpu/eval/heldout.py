"""Heldout-mask builders for the co-smoothing eval modes.

Host-side numpy parity with the reference ``heldout_mask``
(``/root/reference/src/utils/eval_utils.py:988-1045``): all heldout
patterns are static, so they are built once as arrays and fed to compiled
forwards. Returns ``{"spikes": masked, "heldout_idxs": hd, "eval_mask":
1-mask}`` exactly like the reference.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def heldout_mask(
    spike_data: np.ndarray,                 # (K, T, N)
    mode: str = "manual",
    heldout_idxs: np.ndarray = np.array([]),
    n_active: int = 1,
    target_regions: Optional[Sequence[str]] = None,
    neuron_regions: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    spike_data = np.asarray(spike_data)
    mask = np.ones(spike_data.shape, dtype=np.int64)

    if mode == "manual":
        hd = np.asarray(heldout_idxs)
        mask[:, :, hd] = 0

    elif mode == "most":
        act = spike_data.mean(axis=(0, 1))
        act_idx = np.argsort(act)
        hd = np.array(act_idx[-n_active:])
        mask[:, :, hd] = 0

    elif mode == "inter_region":
        hd = []
        for region in target_regions:
            region_idxs = np.argwhere(
                np.asarray(neuron_regions) == region).flatten()
            mask[:, :, region_idxs] = 0
            target_idxs = region_idxs[np.asarray(heldout_idxs)]
            hd.append(target_idxs)
        hd = np.stack(hd).flatten()

    elif mode == "intra_region":
        mask *= 0
        hd = []
        for region in target_regions:
            region_idxs = np.argwhere(
                np.asarray(neuron_regions) == region).flatten()
            mask[:, :, region_idxs] = 1
            if len(heldout_idxs) == 0:
                target_idxs = region_idxs
            else:
                target_idxs = region_idxs[np.asarray(heldout_idxs)]
                mask[:, :, target_idxs] = 0
            hd.append(target_idxs)
        hd = np.stack(hd).flatten()

    elif mode in ("forward_pred", "modal_spike"):
        hd = np.asarray(heldout_idxs)
        mask[:, hd, :] = 0

    elif mode == "modal_behavior":
        hd = np.asarray(heldout_idxs)
        mask[:, hd] = 0

    else:
        raise NotImplementedError("mode not implemented")

    return {
        "spikes": spike_data * mask,
        "heldout_idxs": hd,
        "eval_mask": 1 - mask,
    }
