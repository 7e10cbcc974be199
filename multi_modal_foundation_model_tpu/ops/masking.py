"""The masking-scheme engine (MtM) as PRNG-keyed functional XLA ops.

Reimplements the reference ``Masker`` module
(``/root/reference/src/models/masker.py``) as pure functions: mode/regions
arrive as *arguments*, never as mutable module state (the reference mutates
``masker.mode`` per forward and overwrites its region lists in place —
SURVEY.md §2.4 flags this as a hazard not to replicate).

Mode semantics (parity with ``masker.py:14-35`` docstring + body):

- ``random``        per-element Bernoulli(ratio) over (B, T, N)
- ``temporal``      per-timestep Bernoulli over (B, T), optional consecutive
                    span expansion; ``random_token`` is an alias
- ``causal``        temporal variant with hard ratio 0.01 and (when
                    ``causal_zero``) extension of the mask from the first
                    masked bin to the end of the sequence; the *targets*
                    mask stays the pre-extension mask (``masker.py:140-165``)
- ``neuron``        per-channel Bernoulli over (B, N)
- ``co-smooth``     fixed channel list
- ``forward-pred``  fixed timestep list
- ``inter-region``  sample n regions, mask all their neurons
- ``intra-region``  sample n target regions; within them mask
                    Bernoulli(ratio); all *other* regions stay visible and
                    the loss targets are restricted to the target regions

Masked positions are corrupted BERT-style: of the masked set, ``zero_ratio``
is zeroed; of the remainder, ``random_ratio`` is replaced with
``U[0, max(spikes))`` (``masker.py:157-162``).

Everything is shape-static and jit-compatible; region modes consume integer
region-id arrays (see ``data.loader.prepare_split``). Per-step scheme
selection for MtM runs through :func:`apply_mask_by_id` (``lax.switch`` on a
traced mode id) so one compiled train step serves every scheme.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MASK_MODES = (
    "random",
    "temporal",
    "random_token",
    "causal",
    "neuron",
    "co-smooth",
    "forward-pred",
    "inter-region",
    "intra-region",
)


def mode_to_id(mode: str) -> int:
    return MASK_MODES.index(mode)


@dataclasses.dataclass(frozen=True)
class MaskParams:
    """Static masking hyperparameters (compile-time constants)."""

    ratio: float = 0.3
    zero_ratio: float = 1.0
    random_ratio: float = 1.0
    expand_prob: float = 0.0
    max_timespan: int = 1
    channels: Optional[Tuple[int, ...]] = None      # co-smooth
    timesteps: Optional[Tuple[int, ...]] = None     # forward-pred
    n_mask_regions: int = 1
    causal_zero: bool = True

    @classmethod
    def from_config(cls, cfg) -> "MaskParams":
        def tup(v):
            return tuple(v) if v is not None else None

        return cls(
            ratio=float(cfg.ratio),
            zero_ratio=float(cfg.zero_ratio),
            random_ratio=float(cfg.random_ratio),
            expand_prob=float(cfg.expand_prob),
            max_timespan=int(cfg.max_timespan),
            channels=tup(cfg.get("channels")),
            timesteps=tup(cfg.get("timesteps")),
            n_mask_regions=int(cfg.n_mask_regions),
            causal_zero=bool(cfg.get("causal_zero", True)),
        )


@dataclasses.dataclass(frozen=True)
class RegionSets:
    """Device-side region information for the region-conditioned modes.

    ``region_ids``: (N,) int32 region id per neuron (-1 for padding).
    ``mask_candidates`` / ``target_candidates``: candidate region-id arrays
    for inter-/intra-region sampling ('all' lists expanded host-side, the
    functional analog of ``masker.py:72-76`` without the in-place mutation).
    """

    region_ids: jnp.ndarray
    mask_candidates: jnp.ndarray
    target_candidates: jnp.ndarray

    @classmethod
    def build(cls, region_ids: np.ndarray,
              mask_regions: Optional[Sequence] = ("all",),
              target_regions: Optional[Sequence] = ("all",),
              region_vocab: Optional[dict] = None) -> "RegionSets":
        region_ids = np.asarray(region_ids, dtype=np.int32)
        present = np.unique(region_ids[region_ids >= 0])

        def resolve(names) -> np.ndarray:
            if names is None:
                return present
            names = list(names)
            if "all" in names:
                return present
            assert region_vocab is not None, "need region_vocab to resolve names"
            return np.asarray(sorted(region_vocab[n] for n in names
                                     if n in region_vocab), dtype=np.int32)

        return cls(
            region_ids=jnp.asarray(region_ids),
            mask_candidates=jnp.asarray(resolve(mask_regions), dtype=jnp.int32),
            target_candidates=jnp.asarray(resolve(target_regions), dtype=jnp.int32),
        )


@dataclasses.dataclass(frozen=True)
class RegionTable:
    """Per-session region info stacked for traced session indexing.

    Multi-session runs compile ONE program; the batch's session selects its
    row of ``region_ids (S, N_max)`` / candidate ids (padded with -1) via
    :meth:`select` inside the step.
    """

    region_ids: jnp.ndarray          # (S, N_max) int32, -1 = padding
    mask_candidates: jnp.ndarray     # (S, R_max) int32, -1 = padding
    target_candidates: jnp.ndarray   # (S, R_max) int32, -1 = padding

    @classmethod
    def build(cls, per_session_region_ids: Sequence[np.ndarray],
              mask_regions: Optional[Sequence] = ("all",),
              target_regions: Optional[Sequence] = ("all",),
              region_vocab: Optional[dict] = None) -> "RegionTable":
        sets = [RegionSets.build(ids, mask_regions, target_regions,
                                 region_vocab)
                for ids in per_session_region_ids]
        n_max = max(int(s.region_ids.shape[0]) for s in sets)
        r_max = max(max(int(s.mask_candidates.shape[0]),
                        int(s.target_candidates.shape[0])) for s in sets)

        def pad(a, n):
            a = np.asarray(a, dtype=np.int32)
            return np.pad(a, (0, n - len(a)), constant_values=-1)

        return cls(
            region_ids=jnp.asarray(
                np.stack([pad(s.region_ids, n_max) for s in sets])),
            mask_candidates=jnp.asarray(
                np.stack([pad(s.mask_candidates, r_max) for s in sets])),
            target_candidates=jnp.asarray(
                np.stack([pad(s.target_candidates, r_max) for s in sets])),
        )

    def select(self, session_id) -> RegionSets:
        """RegionSets view for one (traced) session id."""
        return RegionSets(
            region_ids=jnp.take(self.region_ids, session_id, axis=0),
            mask_candidates=jnp.take(self.mask_candidates, session_id,
                                     axis=0),
            target_candidates=jnp.take(self.target_candidates, session_id,
                                       axis=0),
        )


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def expand_timesteps(mask: jnp.ndarray, width) -> jnp.ndarray:
    """Dilate a (B, T) 0/1 mask with a centered window of (traced) ``width``.

    Equivalent to the reference conv1d-with-ones trick
    (``masker.py:170-174``): out[t] = any(mask[t-pad : t-pad+width]) with
    'same' correlation padding pad = (width-1)//2. Built as a banded-matrix
    matmul so ``width`` may be a traced scalar under jit.
    """
    T = mask.shape[-1]
    width = jnp.asarray(width, jnp.int32)
    pad = (width - 1) // 2
    t_out = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    t_in = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    off = t_in - t_out + pad
    band = ((off >= 0) & (off < width)).astype(mask.dtype)
    return (mask @ band.T) >= 1


def _corrupt(key: jax.Array, spikes: jnp.ndarray, mask: jnp.ndarray,
             params: MaskParams) -> jnp.ndarray:
    """BERT-style corruption of masked positions (``masker.py:157-162``).

    ``zero_ratio``/``random_ratio`` are compile-time constants, so the
    degenerate settings short-circuit statically: the default config
    (zero_ratio=1.0) zeroes every masked element deterministically — the
    general path would burn 3 full-(B,T,N) PRNG draws per step for nothing
    (hundreds of MB of random bits on the VPU; measured as the throughput
    bottleneck at production batch sizes).
    """
    if params.zero_ratio >= 1.0:
        return jnp.where(mask, 0.0, spikes)

    kz, kr, ku = jax.random.split(key, 3)
    zero_idx = (jax.random.bernoulli(kz, params.zero_ratio, spikes.shape)
                & mask)
    out = jnp.where(zero_idx, 0.0, spikes)
    if params.random_ratio <= 0.0:
        return out
    random_idx = (jax.random.bernoulli(kr, params.random_ratio, spikes.shape)
                  & mask & ~zero_idx)
    random_vals = spikes.max() * jax.random.uniform(ku, spikes.shape,
                                                    dtype=spikes.dtype)
    return jnp.where(random_idx, random_vals, out)


def _sample_regions(key: jax.Array, candidates: jnp.ndarray,
                    n: int) -> jnp.ndarray:
    """Sample ``n`` region ids uniformly without replacement.

    Gumbel top-k over the candidate list; entries < 0 are padding (used by
    the multi-session RegionTable, where sessions have different region
    counts) and are never selected while valid candidates remain. When ``n``
    exceeds a session's *valid* candidate count (a traced quantity, so it
    cannot be clamped statically) the surplus slots come back as ``-1``
    padding ids — :func:`_member` ignores them, so padded neurons (whose
    ``region_ids`` are also ``-1``) are never matched.
    """
    n = min(n, int(candidates.shape[0]))
    g = jax.random.gumbel(key, candidates.shape)
    scores = jnp.where(candidates >= 0, g, -jnp.inf)
    _, idx = jax.lax.top_k(scores, n)
    return candidates[idx]


def _member(region_ids: jnp.ndarray, sampled: jnp.ndarray) -> jnp.ndarray:
    """(N,) bool: does each neuron's region id appear in ``sampled``.

    ``-1`` entries in ``sampled`` are padding from :func:`_sample_regions`
    (session had fewer valid regions than ``n_mask_regions``) and must not
    match the ``-1`` region ids of padded neuron channels.
    """
    hit = (region_ids[None, :] == sampled[:, None]) & (sampled[:, None] >= 0)
    return hit.any(axis=0)


# ---------------------------------------------------------------------------
# per-mode mask construction: returns (mask(B,T,N) bool, targets(B,T,N) bool)
# ---------------------------------------------------------------------------

def _mask_temporal(key, spikes, params: MaskParams, mode: str):
    B, T, N = spikes.shape
    k_exp, k_span, k_bern, k_cspan = jax.random.split(key, 4)

    if mode == "causal":
        # hard-set ratio (reference ``masker.py:89-93``); span resampled
        ratio = 0.01
        timespan = jax.random.randint(k_cspan, (), 1, params.max_timespan + 1)
    else:
        expand = jax.random.bernoulli(k_exp, params.expand_prob)
        timespan = jnp.where(
            expand,
            jax.random.randint(k_span, (), 1, params.max_timespan + 1),
            1)
        ratio = params.ratio / timespan

    token_mask = jax.random.bernoulli(k_bern, ratio, (B, T))
    token_mask = jnp.where(timespan > 1,
                           expand_timesteps(token_mask.astype(jnp.float32),
                                            timespan),
                           token_mask)

    if mode == "causal" and params.causal_zero:
        # extend each row's mask from its first masked bin to the end;
        # targets stay the pre-extension mask (``masker.py:140-144,164-165``)
        pre = token_mask
        first = jnp.argmax(pre.astype(jnp.int32), axis=1)
        t_idx = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
        extended = pre | (t_idx >= first[:, None])
        mask = extended[:, :, None] & jnp.ones((B, T, N), bool)
        targets = pre[:, :, None] & jnp.ones((B, T, N), bool)
        return mask, targets

    mask = token_mask[:, :, None] & jnp.ones((B, T, N), bool)
    return mask, mask


def _mask_neuron(key, spikes, params: MaskParams):
    B, T, N = spikes.shape
    m = jax.random.bernoulli(key, params.ratio, (B, N))
    mask = m[:, None, :] & jnp.ones((B, T, N), bool)
    return mask, mask


def _mask_random(key, spikes, params: MaskParams):
    mask = jax.random.bernoulli(key, params.ratio, spikes.shape)
    return mask, mask


def _mask_co_smooth(key, spikes, params: MaskParams):
    B, T, N = spikes.shape
    assert params.channels is not None, "No channels to mask"
    chan = jnp.zeros((N,), bool).at[jnp.asarray(params.channels)].set(True)
    mask = jnp.broadcast_to(chan[None, None, :], (B, T, N))
    return mask, mask


def _mask_forward_pred(key, spikes, params: MaskParams):
    B, T, N = spikes.shape
    assert params.timesteps is not None, "No time steps to mask"
    steps = jnp.zeros((T,), bool).at[jnp.asarray(params.timesteps)].set(True)
    mask = jnp.broadcast_to(steps[None, :, None], (B, T, N))
    return mask, mask


def _region_member(key, spikes, candidates, region_ids, n_regions: int):
    """(B, N) bool region membership after sampling ``n_regions`` ids.

    Scalar-session path (``region_ids (N,)``): ONE draw shared by the
    whole batch (the reference samples regions once per batch —
    ``masker.py:103-116``). Per-sample path (``region_ids (B, N)``,
    session-mixed batches): each sample draws against its own session's
    candidate row, keys split per row.
    """
    B, T, N = spikes.shape
    if region_ids.ndim == 2:
        keys = jax.random.split(key, B)
        sampled = jax.vmap(_sample_regions, in_axes=(0, 0, None))(
            keys, candidates, n_regions)                 # (B, n)
        return jax.vmap(_member)(region_ids, sampled)    # (B, N)
    sampled = _sample_regions(key, candidates, n_regions)
    member = _member(region_ids, sampled)                # (N,)
    return jnp.broadcast_to(member[None, :], (B, N))


def _mask_inter_region(key, spikes, params: MaskParams, regions: RegionSets):
    B, T, N = spikes.shape
    member = _region_member(key, spikes, regions.mask_candidates,
                            regions.region_ids, params.n_mask_regions)
    mask = jnp.broadcast_to(member[:, None, :], (B, T, N))
    return mask, mask


def _mask_intra_region(key, spikes, params: MaskParams, regions: RegionSets):
    B, T, N = spikes.shape
    k_sel, k_bern = jax.random.split(key)
    member = _region_member(k_sel, spikes, regions.target_candidates,
                            regions.region_ids, params.n_mask_regions)
    # inside target regions: Bernoulli(ratio); outside: always masked
    # (inputs from other regions are visible is NOT the case here — the
    # reference masks everything outside, prob 1: ``masker.py:117-127``)
    probs = jnp.where(member, params.ratio, 1.0)         # (B, N)
    m = jax.random.bernoulli(k_bern, probs)
    mask = m[:, None, :] & jnp.ones((B, T, N), bool)
    targets = mask & jnp.broadcast_to(member[:, None, :], (B, T, N))
    return mask, targets


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def apply_mask(
    key: jax.Array,
    spikes: jnp.ndarray,                 # (B, T, N)
    params: MaskParams,
    mode: str,
    regions: Optional[RegionSets] = None,
    active: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mask + corrupt ``spikes``; returns (corrupted, targets_mask int32).

    ``mode`` is static (compiles one program per mode); use
    :func:`apply_mask_by_id` for traced per-step scheme switching.
    ``active=False`` (eval without force_active, or ratio 0 — the reference
    guard block ``masker.py:62-69``) returns inputs untouched with a zero
    targets mask.
    """
    if not active or (params.ratio == 0 and mode not in
                      ("co-smooth", "forward-pred", "inter-region")):
        return spikes, jnp.zeros_like(spikes, dtype=jnp.int32)

    k_mask, k_corrupt = jax.random.split(key)
    if mode in ("temporal", "random_token", "causal"):
        mask, targets = _mask_temporal(k_mask, spikes, params, mode)
    elif mode == "neuron":
        mask, targets = _mask_neuron(k_mask, spikes, params)
    elif mode == "random":
        mask, targets = _mask_random(k_mask, spikes, params)
    elif mode == "co-smooth":
        mask, targets = _mask_co_smooth(k_mask, spikes, params)
    elif mode == "forward-pred":
        mask, targets = _mask_forward_pred(k_mask, spikes, params)
    elif mode == "inter-region":
        assert regions is not None, "inter-region masking needs RegionSets"
        mask, targets = _mask_inter_region(k_mask, spikes, params, regions)
    elif mode == "intra-region":
        assert regions is not None, "intra-region masking needs RegionSets"
        mask, targets = _mask_intra_region(k_mask, spikes, params, regions)
    else:
        raise ValueError(f"Masking mode {mode!r} not implemented")

    corrupted = _corrupt(k_corrupt, spikes, mask, params)
    return corrupted, targets.astype(jnp.int32)


def apply_mask_by_id(
    key: jax.Array,
    spikes: jnp.ndarray,
    params: MaskParams,
    mode_id: jnp.ndarray,                # traced int32 index into `modes`
    modes: Sequence[str],
    regions: Optional[RegionSets] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """lax.switch over masking schemes for MtM per-step sampling.

    All branches share output shapes, so a single compiled train step covers
    the whole scheme menu (the reference re-randomizes the scheme per batch
    host-side: ``trainer/base.py:186-190``).
    """
    branches = []
    for mode in modes:
        branches.append(lambda op, m=mode: apply_mask(
            op[0], op[1], params, m, regions=regions))
    return jax.lax.switch(mode_id, branches, (key, spikes))
