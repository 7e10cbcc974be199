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
        idxs = np.asarray(idxs, dtype=np.int64)
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
                     target_names: Sequence[str] = DEFAULT_TARGETS,
                     aligned: bool = True) -> SessionSplits:
    """Load one IBL session (train/val/test) from the HF hub.

    Mirrors the reference entry-script path
    (``src/train_multi_modal.py:110-113``); ``aligned=False`` loads the
    ``<eid>_unaligned`` chunked dataset the reference's unaligned eval
    consumes (``eval_utils.py:1392-1459``). Requires network access to the
    hub or a warm ``cache_dir``.
    """
    from datasets import load_dataset  # lazy: heavy import, network-gated

    suffix = "aligned" if aligned else "unaligned"
    ds = load_dataset(f"{org}/{eid}_{suffix}", cache_dir=cache_dir)
    splits = {}
    for split in ("train", "val", "test"):
        rows = ds[split][:]
        splits[split] = _rows_to_session(rows, eid, target_names)
    return SessionSplits(**splits)


def _merge_session(parts: Sequence[SessionData]) -> SessionData:
    """Concatenate same-session splits along the trial axis."""
    first = parts[0]
    return dataclasses.replace(
        first,
        spikes=np.concatenate([p.spikes for p in parts], axis=0),
        behavior=np.concatenate([p.behavior for p in parts], axis=0),
        choice=np.concatenate([p.choice for p in parts], axis=0),
        block=np.concatenate([p.block for p in parts], axis=0),
        reward=np.concatenate([p.reward for p in parts], axis=0),
    )


def _truncate_to_batch(sess: SessionData, batch_size: int) -> SessionData:
    """Drop tail trials so the count is a batch-size multiple — load-bearing
    for fixed-shape batching (parity: ``dataset_utils.py:262-272``)."""
    n = sess.n_trials - sess.n_trials % batch_size
    return sess.subset(range(n))


def load_ibl_dataset(
    cache_dir: Optional[str],
    user_or_org_name: str = "neurofm123",
    eid: Optional[str] = None,
    num_sessions: int = 1,
    split_method: str = "predefined",
    train_session_eid: Sequence[str] = (),
    test_session_eid: Sequence[str] = (),
    split_size: float = 0.1,
    mode: str = "train",
    batch_size: int = 16,
    use_re: bool = False,
    target_eids_path: str = "data/target_eids.txt",
    test_re_eids_path: str = "data/test_re_eids.txt",
    train_aligned: bool = True,
    seed: int = 42,
    eids: Optional[Sequence[str]] = None,
    _load_session=None,
    _list_datasets=None,
) -> Tuple[Optional[dict], Optional[dict], Optional[dict], dict]:
    """Multi-session assembly with the reference's full split machinery.

    Parity: ``/root/reference/src/utils/dataset_utils.py:160-320``. Covers
    hub session discovery (``get_user_datasets``), the aligned/unaligned
    name filter, ``use_re`` allow/deny eid filtering, per-split truncation
    of trial counts to batch-size multiples (``predefined``), a seeded
    ``random_split`` mode, the held-out-session ``session_based`` mode and
    the eval-only mode (``mode="eval"``: loads only the test sessions).

    Returns ``(train, val, test, meta_data)`` — always a 4-tuple, where
    dataset dicts map eid -> SessionSplits (the reference returns bare HF
    datasets with varying tuple arity per mode; sessions here stay keyed so
    the stitched multi-session loader can bucket by neuron count).
    ``meta_data`` carries ``num_neurons`` (per-eid list), ``num_sessions``
    and ``eids`` — the keys the reference trainer consumes
    (``dataset_utils.py:295-299``). Per-session load failures are skipped
    (``dataset_utils.py:282-285``).

    Deviations, documented: ``random_split`` shuffles and splits trials
    *within* each session (dense same-N arrays replace the reference's
    row-level HF concat; the statistical intent — a random trial-level
    split instead of the hub's predefined one — is preserved), and both
    ``random_split``/``session_based`` define the val split (val=test view)
    where the reference's code paths raise NameError on return
    (SURVEY.md §2.8 "known defects").

    ``_load_session`` / ``_list_datasets`` are dependency-injection points
    (tests drive all split methods offline against synthetic sessions).
    """
    load_one = _load_session or (
        lambda e: load_ibl_session(e, cache_dir=cache_dir,
                                   org=user_or_org_name,
                                   aligned=train_aligned))

    # ---- session discovery -------------------------------------------
    if eids:
        wanted = list(eids)
    elif eid is not None:
        wanted = [eid]
    elif train_session_eid:
        wanted = list(train_session_eid)
    else:  # hub discovery (get_user_datasets, dataset_utils.py:157-162)
        if _list_datasets is not None:
            ids = _list_datasets(user_or_org_name)
        else:
            from .dataset import get_user_datasets
            ids = get_user_datasets(user_or_org_name)
        ids = [d.split("/", 1)[1] if "/" in d else d for d in ids]
        # suffix-exact filter: the hub names datasets <eid>_aligned /
        # <eid>_unaligned, and "aligned" is a SUBSTRING of "unaligned" —
        # the reference's substring filter (dataset_utils.py:218-222)
        # keeps '<eid>_unaligned' in its aligned list and can never select
        # unaligned data (SURVEY.md §2.8 "known defects"; fixed here)
        suffix = "_aligned" if train_aligned else "_unaligned"
        wanted = [d[: -len(suffix)] for d in ids if d.endswith(suffix)]

    test_eids = [e for e in test_session_eid]
    assert not (test_eids and split_method == "random_split"), (
        "When you have a test session, the split method should be "
        "'session_based'")
    wanted = [e for e in wanted if e not in set(test_eids)]

    if use_re:
        from .dataset import read_eid_list
        allow = set(read_eid_list(target_eids_path))
        deny = set(read_eid_list(test_re_eids_path))
        wanted = [e for e in wanted if e in allow and e not in deny]

    # num_sessions counts train AND test sessions (dataset_utils.py:212);
    # 0 means "no train sessions" (NOT "all" — guard the falsy-0 slice),
    # and negatives are a caller error, not a tail slice
    n_train_sessions = (num_sessions - len(test_eids)
                        if test_eids else num_sessions)
    assert n_train_sessions >= 0, (
        f"num_sessions={num_sessions} < len(test_session_eid)="
        f"{len(test_eids)}")
    wanted = wanted[:n_train_sessions]

    # ---- load --------------------------------------------------------
    def load_many(eid_list):
        out: Dict[str, SessionSplits] = {}
        for e in eid_list:
            try:
                out[e] = load_one(e)
            except Exception:  # skipped, like the reference
                continue
        return out

    if mode == "eval":  # eval-only: test sessions only (:224-231)
        test = load_many(test_eids)
        meta = _session_meta(test)
        return None, None, test or None, meta

    loaded = load_many(wanted)
    train: Dict[str, SessionSplits] = {}
    val: Dict[str, SessionSplits] = {}
    test: Dict[str, SessionSplits] = {}

    if split_method == "predefined":
        for e, s in loaded.items():
            tr = _truncate_to_batch(s.train, batch_size)
            va = _truncate_to_batch(s.val, batch_size)
            te = _truncate_to_batch(s.test, batch_size)
            sp = SessionSplits(train=tr, val=va, test=te)
            train[e] = val[e] = test[e] = sp
    elif split_method == "random_split":
        rng = np.random.default_rng(seed)
        for e, s in loaded.items():
            whole = _merge_session([s.train, s.val, s.test])
            perm = rng.permutation(whole.n_trials)
            n_test = max(1, int(round(split_size * whole.n_trials)))
            n_val = max(1, int(round(split_size * (whole.n_trials - n_test))))
            te = whole.subset(perm[:n_test])
            va = whole.subset(perm[n_test:n_test + n_val])
            tr = whole.subset(perm[n_test + n_val:])
            sp = SessionSplits(train=tr, val=va, test=te)
            train[e] = val[e] = test[e] = sp
    elif split_method == "session_based":
        for e, s in loaded.items():
            train[e] = val[e] = s
        test = load_many(test_eids)
    else:
        raise ValueError(
            "Invalid split method. Please choose 'predefined', "
            "'random_split' or 'session_based'")

    # meta covers held-out test sessions too: stitched tokenizer/head
    # sizing and per-eid eval need entries for the sessions returned in
    # ``test`` (the reference's session_based branch returns no meta at
    # all — NameError, SURVEY.md §2.8 "known defects")
    meta = _session_meta({**loaded, **{e: s for e, s in test.items()
                                       if e not in loaded}})
    return train or None, val or None, test or None, meta


def _session_meta(splits_by_eid: Dict[str, SessionSplits]) -> dict:
    eids = list(splits_by_eid.keys())
    nn = [s.n_neurons for s in splits_by_eid.values()]
    return {"num_neurons": nn, "num_sessions": len(eids), "eids": eids,
            "eid_list": {e: n for e, n in zip(eids, nn)}}
