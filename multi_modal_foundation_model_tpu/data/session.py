"""Session-level datasets: IBL sessions from the HF hub + synthetic sessions.

The dataset contract matches the reference hub format
(``neurofm123/<eid>_aligned`` rows with CSR spike columns, behavior traces,
trial scalars, cluster metadata — ``/root/reference/src/utils/dataset_utils.py:45-80``)
but is materialized as whole-split dense arrays up front: at this workload
scale (hundreds of trials x 100 bins x <1000 neurons) the full split fits in
host RAM, so per-item torch-style Dataset indexing is replaced by one
vectorized decode + pad pass feeding fixed-shape device batches.

``synthetic_session`` generates statistically-plausible sessions with real
spike/behavior coupling so training/eval pipelines are testable offline
(the reference has no such fixture; SURVEY.md §4).
"""

from __future__ import annotations

import dataclasses
import hashlib
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .sparse import sparse_rows_to_dense

DEFAULT_TARGETS = ("wheel-speed", "whisker-motion-energy")
_REGION_POOL = ("CA1", "DG", "LP", "PO", "VISa", "VISam", "MRN", "APN", "root")


@dataclasses.dataclass
class SessionData:
    """One split of one session as dense arrays.

    Shapes: spikes (K, T, N); behavior (K, T, n_beh); trial scalars (K,);
    neuron metadata (N,).
    """

    eid: str
    spikes: np.ndarray
    behavior: np.ndarray
    choice: np.ndarray
    block: np.ndarray
    reward: np.ndarray
    neuron_regions: np.ndarray
    neuron_depths: np.ndarray
    binsize: float = 0.02
    target_names: Tuple[str, ...] = DEFAULT_TARGETS
    # per-neuron spike-sorting uuids (N,) str — consumed by the NEMO
    # unit-embedding filter (reference ``loader/base.py:331-343``)
    cluster_uuids: Optional[np.ndarray] = None

    @property
    def n_trials(self) -> int:
        return int(self.spikes.shape[0])

    @property
    def n_timesteps(self) -> int:
        return int(self.spikes.shape[1])

    @property
    def n_neurons(self) -> int:
        return int(self.spikes.shape[2])

    def subset(self, idxs: Sequence[int]) -> "SessionData":
        idxs = np.asarray(idxs)
        return dataclasses.replace(
            self,
            spikes=self.spikes[idxs],
            behavior=self.behavior[idxs],
            choice=self.choice[idxs],
            block=self.block[idxs],
            reward=self.reward[idxs],
        )


@dataclasses.dataclass
class SessionSplits:
    train: SessionData
    val: SessionData
    test: SessionData

    @property
    def eid(self) -> str:
        return self.train.eid

    @property
    def n_neurons(self) -> int:
        return self.train.n_neurons


def _smooth(x: np.ndarray, width: int) -> np.ndarray:
    # np.convolve 'same' returns max(len, width) samples — clamp the kernel
    # so short sequences keep their length
    width = min(width, x.shape[-1])
    kernel = np.ones(width) / width
    return np.apply_along_axis(
        lambda r: np.convolve(r, kernel, mode="same"), -1, x)


def synthetic_session(
    seed: int = 0,
    n_trials: int = 200,
    n_timesteps: int = 100,
    n_neurons: int = 64,
    n_behaviors: int = 2,
    n_latents: int = 6,
    eid: Optional[str] = None,
    binsize: float = 0.02,
) -> SessionData:
    """Generate a session with genuine spike<->behavior coupling.

    Latent factors drive both Poisson spike rates and the behavior traces,
    so encoding (behavior->spikes) and decoding (spikes->behavior) are
    learnable and the eval metrics move above chance within a few epochs.
    """
    rng = np.random.default_rng(seed)
    if eid is None:
        eid = "synthetic-" + hashlib.sha1(
            f"{seed}-{n_trials}-{n_neurons}".encode()).hexdigest()[:8]

    # trial-level task variables
    choice = rng.choice([-1.0, 1.0], size=n_trials)
    block = rng.choice([0.2, 0.5, 0.8], size=n_trials)
    reward = rng.choice([0.0, 1.0], size=n_trials, p=[0.3, 0.7])

    # smooth latent trajectories, modulated by choice
    latents = _smooth(rng.normal(size=(n_trials, n_latents, n_timesteps)), 9)
    t_axis = np.linspace(0, 1, n_timesteps)
    stim_bump = np.exp(-((t_axis - 0.35) ** 2) / 0.01)
    latents[:, 0] += choice[:, None] * stim_bump[None, :]
    latents[:, 1] += reward[:, None] * np.clip(t_axis - 0.5, 0, None)[None, :] * 2.0
    latents = latents.transpose(0, 2, 1)  # (K, T, L)

    # behavior = linear readout of latents + noise
    w_beh = rng.normal(scale=1.0, size=(n_latents, n_behaviors))
    behavior = latents @ w_beh + 0.05 * rng.normal(
        size=(n_trials, n_timesteps, n_behaviors))
    behavior = behavior.astype(np.float32)

    # spikes = Poisson(exp(latent readout)); mean rate ~ a spike / few bins
    w_spk = rng.normal(scale=0.4, size=(n_latents, n_neurons))
    log_rates = latents @ w_spk + rng.normal(scale=0.2, size=n_neurons) - 1.2
    rates = np.exp(np.clip(log_rates, -6.0, 3.0))
    spikes = rng.poisson(rates).astype(np.float32)

    neuron_regions = rng.choice(_REGION_POOL[:max(2, n_neurons // 16)],
                                size=n_neurons).astype(str)
    neuron_depths = np.sort(rng.uniform(0, 3000, size=n_neurons)).astype(np.float32)

    return SessionData(
        eid=eid,
        spikes=spikes,
        behavior=behavior,
        choice=choice.astype(np.float32),
        block=block.astype(np.float32),
        reward=reward.astype(np.float32),
        neuron_regions=neuron_regions,
        neuron_depths=neuron_depths,
        binsize=binsize,
    )


def synthetic_splits(seed: int = 0, n_trials: int = 200, **kwargs) -> SessionSplits:
    """Train/val/test split of one synthetic session (80/10/10)."""
    sess = synthetic_session(seed=seed, n_trials=n_trials, **kwargs)
    n_train = int(0.8 * n_trials)
    n_val = max(1, int(0.1 * n_trials))
    return SessionSplits(
        train=sess.subset(range(0, n_train)),
        val=sess.subset(range(n_train, n_train + n_val)),
        test=sess.subset(range(n_train + n_val, n_trials)),
    )


# ---------------------------------------------------------------------------
# IBL hub loading (network-gated; host-side ETL consumers)
# ---------------------------------------------------------------------------

def _rows_to_session(rows: Dict[str, list], eid: str,
                     target_names: Sequence[str] = DEFAULT_TARGETS) -> SessionData:
    """Convert HF dataset columns (reference hub schema) to a SessionData."""
    spikes = sparse_rows_to_dense(
        rows["spikes_sparse_data"],
        rows["spikes_sparse_indices"],
        rows["spikes_sparse_indptr"],
        rows["spikes_sparse_shape"],
    ).astype(np.float32)

    behavior = np.stack(
        [np.asarray(rows[name], dtype=np.float32) for name in target_names],
        axis=-1)

    regions = np.asarray(rows["cluster_regions"][0]).astype(str)
    if "cluster_depths" in rows and rows["cluster_depths"][0] is not None:
        depths = np.asarray(rows["cluster_depths"][0], dtype=np.float32)
    else:
        depths = np.full(spikes.shape[-1], np.nan, dtype=np.float32)

    return SessionData(
        eid=eid,
        spikes=spikes,
        behavior=behavior,
        choice=np.asarray(rows["choice"], dtype=np.float32),
        block=np.asarray(rows["block"], dtype=np.float32),
        reward=np.asarray(rows["reward"], dtype=np.float32),
        neuron_regions=regions,
        neuron_depths=depths,
        binsize=float(np.asarray(rows["binsize"])[0]) if "binsize" in rows else 0.02,
        target_names=tuple(target_names),
    )


def load_ibl_session(eid: str, cache_dir: Optional[str] = None,
                     org: str = "neurofm123",
                     target_names: Sequence[str] = DEFAULT_TARGETS) -> SessionSplits:
    """Load one aligned IBL session (train/val/test) from the HF hub.

    Mirrors the reference entry-script path
    (``src/train_multi_modal.py:110-113``). Requires network access to the
    hub or a warm ``cache_dir``.
    """
    from datasets import load_dataset  # lazy: heavy import, network-gated

    ds = load_dataset(f"{org}/{eid}_aligned", cache_dir=cache_dir)
    splits = {}
    for split in ("train", "val", "test"):
        rows = ds[split][:]
        splits[split] = _rows_to_session(rows, eid, target_names)
    return SessionSplits(**splits)


def load_ibl_dataset(
    cache_dir: Optional[str],
    user_or_org_name: str = "neurofm123",
    eid: Optional[str] = None,
    num_sessions: int = 1,
    split_method: str = "predefined",
    test_session_eid: Sequence[str] = (),
    batch_size: int = 16,
    seed: int = 42,
    eids: Optional[Sequence[str]] = None,
) -> Tuple[Optional[dict], Optional[dict], Optional[dict], dict]:
    """Multi-session discovery + metadata, reference-API compatible.

    Returns ``(train, val, test, meta_data)`` where meta_data carries
    ``num_neurons`` (per-eid list), ``num_sessions`` and ``eids`` — the keys
    the reference trainer consumes (``dataset_utils.py:295-299``). Dataset
    dicts map eid -> SessionSplits; sessions that fail to load are skipped
    (parity with ``dataset_utils.py:282-285``).
    """
    wanted = list(eids) if eids else ([eid] if eid else [])
    train, val, test = {}, {}, {}
    loaded_eids: List[str] = []
    num_neurons: List[int] = []
    for e in wanted[: num_sessions if num_sessions else None]:
        try:
            splits = load_ibl_session(e, cache_dir=cache_dir, org=user_or_org_name)
        except Exception:  # per-session failures skipped, like the reference
            continue
        if split_method == "session_based" and e in set(test_session_eid):
            test[e] = splits
        else:
            train[e] = splits
            val[e] = splits
        loaded_eids.append(e)
        num_neurons.append(splits.n_neurons)

    meta_data = {
        "num_neurons": num_neurons,
        "num_sessions": len(loaded_eids),
        "eids": loaded_eids,
        "eid_list": {e: n for e, n in zip(loaded_eids, num_neurons)},
    }
    return train or None, val or None, test or None, meta_data
