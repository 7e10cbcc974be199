"""Multi-session pretraining: session-stitched model, interleaved loaders.

New work in this framework (BASELINE.json configs 4-5): the reference's
multi-session support is latent — same-neuron-count batch grouping in the
stitch sampler (``/root/reference/src/loader/base.py:150-179``) and
per-neuron-count eval bookkeeping (``trainer/base.py:208-213``) — but its
entry scripts only ever train one session.

TPU-first design decisions:

- All sessions pad to ONE ``N_max`` (token count is fixed at 2 modalities x
  T regardless of neuron count, so attention cost is unchanged and only the
  tokenizer GEMM widens) — every session runs through a single compiled
  step with a *traced* ``session_id`` that indexes stitched parameters
  (models/layers.py SessionStitchedTokenizer/Head) and the per-session
  region table (ops/masking.RegionTable).
- The epoch schedule interleaves batches from all sessions, shuffled
  deterministically from (seed, epoch), so multi-host runs derive identical
  schedules.
- Each batch is single-session (the reference's invariant:
  ``trainer/base.py:66`` "each batch is from the same eid").
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loader import DataLoader, make_loader
from ..data.session import SessionSplits
from ..eval.metrics import bits_per_spike, metrics_list
from ..ops.masking import RegionTable
from .logging import MetricLogger
from .schedule import OptimizerConfig
from .trainer import MultiModalTrainer, TrainerConfig, _with_tp


def _bucket_session_widths(
    num_neurons: Sequence[int], num_trials: Sequence[int],
    pad_multiple: int, n_buckets: int,
) -> List[int]:
    """Per-session padded widths for ``n_buckets`` shape buckets.

    Partitions sessions (sorted by neuron count) into at most ``n_buckets``
    contiguous groups; each group pads to its widest member's
    lane-quantized width. The split minimizes total padded *cells*
    (``(bucket_width - n_neurons) * n_trials`` summed over sessions) by
    exact dynamic programming — session counts are small (O(100)), so the
    O(S^2 * n_buckets) DP is free. ``n_buckets=1`` reproduces the single
    global N_max every session previously padded to.
    """
    S = len(num_neurons)
    order = sorted(range(S), key=lambda i: num_neurons[i])

    def q(w: int) -> int:
        return ((w + pad_multiple - 1) // pad_multiple) * pad_multiple

    # group cost of sorted sessions [j, i): pad to q(width of i-1)
    INF = float("inf")
    nb = min(n_buckets, S)
    dp = [[INF] * (nb + 1) for _ in range(S + 1)]
    back = [[0] * (nb + 1) for _ in range(S + 1)]
    dp[0][0] = 0.0
    for i in range(1, S + 1):
        for k in range(1, nb + 1):
            w_i = q(num_neurons[order[i - 1]])
            cost = 0.0
            for j in range(i - 1, -1, -1):
                if j < i - 1:
                    s = order[j]
                    cost += (w_i - num_neurons[s]) * num_trials[s]
                # sessions j..i-1 form one bucket of width w_i
                e = order[i - 1]
                total = cost + (w_i - num_neurons[e]) * num_trials[e]
                if dp[j][k - 1] + total < dp[i][k]:
                    dp[i][k] = dp[j][k - 1] + total
                    back[i][k] = j
    k_best = min(range(1, nb + 1), key=lambda k: dp[S][k])
    widths = [0] * S
    i, k = S, k_best
    while i > 0:
        j = back[i][k]
        w = q(num_neurons[order[i - 1]])
        for t in range(j, i):
            widths[order[t]] = w
        i, k = j, k - 1
    return widths


def build_multisession_loaders(
    sessions: Dict[str, SessionSplits],
    batch_size: int,
    *,
    max_time_length: int = 100,
    pad_multiple: int = 128,
    n_buckets: int = 1,
    target: Optional[Sequence[str]] = None,
    seed: int = 42,
) -> Tuple[Dict[str, DataLoader], Dict[str, DataLoader], Dict[str, DataLoader],
           dict]:
    """(train, val, test) loader dicts + meta (N_max, sid map, region table).

    Builds a shared region vocabulary across sessions so region ids are
    comparable, pads every session's space axis to a lane-friendly bucket
    width, and assembles the stacked RegionTable.

    ``n_buckets`` (default 1 = one global ``N_max``) groups sessions into
    up to that many padded-width buckets: a 200-neuron session in an
    80-session mix no longer pays the 640-wide stitched tokenizer/head
    GEMMs of the widest session — it runs a static slice of the same
    stitched parameters at its bucket's width (models/layers.py
    SessionStitchedTokenizer/Head), one compiled program per bucket.
    The reference's analog is same-neuron-count batch grouping
    (``loader/base.py:150-179``); buckets generalize it to
    few-compilations groups with padding.
    """
    eids = sorted(sessions.keys())
    widths = _bucket_session_widths(
        [sessions[e].n_neurons for e in eids],
        [sessions[e].train.n_trials for e in eids],
        pad_multiple, n_buckets)
    n_max = max(widths)

    region_vocab: Dict[str, int] = {}
    for e in eids:
        for r in sorted(set(sessions[e].train.neuron_regions.astype(str))):
            region_vocab.setdefault(r, len(region_vocab))

    train, val, test = {}, {}, {}
    per_session_region_ids: List[np.ndarray] = []
    for e, w in zip(eids, widths):
        kw = dict(batch_size=batch_size, target=target,
                  max_time_length=max_time_length, max_space_length=w,
                  region_vocab=region_vocab, seed=seed)
        train[e] = make_loader(sessions[e].train, **kw)
        val[e] = make_loader(sessions[e].val, shuffle=False, **kw)
        test[e] = make_loader(sessions[e].test, shuffle=False, **kw)
        per_session_region_ids.append(train[e].arrays["region_ids"])

    meta = {
        "eids": eids,
        "eid_to_sid": {e: i for i, e in enumerate(eids)},
        "num_neurons": [sessions[e].n_neurons for e in eids],
        "n_max": n_max,
        "bucket_widths": {e: w for e, w in zip(eids, widths)},
        "region_vocab": region_vocab,
        "per_session_region_ids": per_session_region_ids,
    }
    return train, val, test, meta


class MultiSessionTrainer(MultiModalTrainer):
    """MultiModalTrainer over a dict of per-session loaders.

    The model must be built with ``n_sessions = len(loaders)`` and
    ``n_channels['ap'] = N_max``.
    """

    def __init__(
        self,
        model,
        train_loaders: Dict[str, DataLoader],
        eval_loaders: Optional[Dict[str, DataLoader]],
        optimizer_config: OptimizerConfig,
        trainer_config: TrainerConfig,
        *,
        region_table: RegionTable,
        eid_to_sid: Dict[str, int],
        mesh=None,
        logger: Optional[MetricLogger] = None,
        modal_filter=None,
    ):
        self.train_loaders = train_loaders
        self.eval_loaders = eval_loaders or {}
        self.region_table = region_table
        self.eid_to_sid = dict(eid_to_sid)
        first = next(iter(train_loaders))
        total_batches = sum(len(l) for l in train_loaders.values())
        self._total_batches = total_batches
        # session-mixed batches draw from one trial pool per shape bucket,
        # so an epoch is sum over buckets of ceil(bucket_trials/B) steps —
        # NOT the sum of per-session batch counts (which over-counts every
        # session's ragged tail and would size the OneCycle schedule for
        # steps that never run). One bucket == ceil(total/B).
        B = train_loaders[first].batch_size
        self._mixed_batches = sum(
            -(-sum(train_loaders[e].n_trials for e in grp) // B)
            for grp in self._stack_groups())
        super().__init__(
            model, train_loaders[first], eval_loaders[first] if eval_loaders
            else None, optimizer_config, trainer_config,
            modal_filter=modal_filter, mesh=mesh, logger=logger)

    # total steps must count every session's batches, not just the first's
    def _steps_per_epoch(self) -> int:
        if self.tcfg.mixed_session_batches:
            return self._mixed_batches
        return self._total_batches

    @_with_tp
    def _init_state(self):
        batch = self._example_batch()
        mod_inputs = self._build_mod_inputs(batch, None)
        k_param, k_mask, k_drop = jax.random.split(self.base_key, 3)
        init_fn = jax.jit(partial(self.model.init, training=False))
        variables = init_fn(
            {"params": k_param, "mask": k_mask, "dropout": k_drop},
            mod_inputs, session_id=jnp.asarray(0, jnp.int32),
            space_attn_mask=batch["space_attn_mask"])
        from ..parallel import shard_tree
        from .trainer import TrainState
        state = TrainState.create(
            apply_fn=self.model.apply, params=variables["params"], tx=self.tx)
        return shard_tree(state, self.mesh)

    # ------------------------------------------------------------------

    def _device_batch(self, batch):
        from ..parallel import shard_batch
        out = super()._device_batch(batch)
        out.update(shard_batch(
            {"space_attn_mask": batch["space_attn_mask"]}, self.mesh))
        return out

    # device-resident splits additionally carry the per-session space mask
    _DR_KEYS = ("spikes_data", "target", "time_attn_mask",
                "spikes_timestamps", "space_attn_mask")

    def _get_train_step_dr(self, training_mode, use_mtm):
        key = ("ms-dr", training_mode, use_mtm)
        if key in self._train_steps:
            return self._train_steps[key]

        mtm_modes = tuple(self.masking_schemes or ())
        table = self.region_table

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, data, idx, valid, scheme_id, session_id, base_key):
            batch = self._gather_batch(data, idx, valid)
            return self._grad_scan_step(
                state, batch, scheme_id, training_mode, use_mtm, mtm_modes,
                table.select(session_id), base_key, session_id=session_id,
                space_attn_mask=batch["space_attn_mask"])

        self._train_steps[key] = self._tp_wrap(step)
        return self._train_steps[key]

    def _get_eval_step_dr(self, training_mode, use_mtm):
        key = ("ms-dr", training_mode, use_mtm)
        if key in self._eval_steps:
            return self._eval_steps[key]

        mtm_modes = tuple(self.masking_schemes or ())
        table = self.region_table

        @jax.jit
        def step(params, data, idx, valid, scheme_id, session_id, base_key):
            batch = self._gather_batch(data, idx, valid)
            k_mask, _ = jax.random.split(base_key)
            regions = table.select(session_id)
            mod_inputs = self._build_mod_inputs(batch, training_mode)
            out = self.model.apply(
                {"params": params}, mod_inputs,
                masking_mode=scheme_id if use_mtm else None,
                mtm_modes=mtm_modes, regions=regions, training=False,
                session_id=session_id,
                space_attn_mask=batch["space_attn_mask"],
                rngs={"mask": k_mask})
            return out.loss, out.mod_preds, out.mod_targets

        self._eval_steps[key] = self._tp_wrap(step)
        return self._eval_steps[key]

    def _get_train_step(self, training_mode, use_mtm):
        key = ("ms", training_mode, use_mtm)
        if key in self._train_steps:
            return self._train_steps[key]

        mtm_modes = tuple(self.masking_schemes or ())
        table = self.region_table

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, batch, scheme_id, session_id, base_key):
            return self._grad_scan_step(
                state, batch, scheme_id, training_mode, use_mtm, mtm_modes,
                table.select(session_id), base_key, session_id=session_id,
                space_attn_mask=batch["space_attn_mask"])

        self._train_steps[key] = self._tp_wrap(step)
        return self._train_steps[key]

    def _get_eval_step(self, training_mode, use_mtm):
        key = ("ms", training_mode, use_mtm)
        if key in self._eval_steps:
            return self._eval_steps[key]

        mtm_modes = tuple(self.masking_schemes or ())
        table = self.region_table

        @jax.jit
        def step(params, batch, scheme_id, session_id, base_key):
            k_mask, _ = jax.random.split(base_key)
            regions = table.select(session_id)
            mod_inputs = self._build_mod_inputs(batch, training_mode)
            out = self.model.apply(
                {"params": params}, mod_inputs,
                masking_mode=scheme_id if use_mtm else None,
                mtm_modes=mtm_modes, regions=regions, training=False,
                session_id=session_id,
                space_attn_mask=batch["space_attn_mask"],
                rngs={"mask": k_mask})
            return out.loss, out.mod_preds, out.mod_targets

        self._eval_steps[key] = self._tp_wrap(step)
        return self._eval_steps[key]

    # ------------------------------------------------------------------

    def _epoch_schedule(self, epoch: int) -> List[str]:
        """Deterministic shuffled interleave: each eid appears once per
        batch its loader yields this epoch."""
        eids = []
        for e, loader in self.train_loaders.items():
            eids.extend([e] * len(loader))
        rng = np.random.default_rng((self.tcfg.seed, epoch, 7))
        rng.shuffle(eids)
        return eids

    def train_epoch(self, epoch: int):
        from ..data.prefetch import DevicePrefetcher

        self._reseed_host_rng(epoch)   # trajectory-exact resume (trainer.py)
        if self.tcfg.device_resident_data:
            return self._train_epoch_dr(epoch)
        if self.tcfg.mixed_session_batches:
            # only the device-resident path implements cross-session
            # batches; raise rather than silently train single-session
            raise ValueError(
                "mixed_session_batches requires device_resident_data=True "
                "(the streaming path has no cross-session gather)")

        iters = {}
        for e, loader in self.train_loaders.items():
            loader.set_epoch(epoch)
            iters[e] = iter(loader)
        losses = []

        def host_batches():
            for eid in self._epoch_schedule(epoch):
                yield eid, next(iters[eid])

        # opt-in: placement runs ahead on a daemon thread so the
        # host->device transfer overlaps the previous step's compute
        # (direct-attached TPUs; hurts through a tunnel — TrainerConfig)
        if self.tcfg.prefetch_depth > 0:
            batches = DevicePrefetcher(
                host_batches(),
                lambda t: (t[0], self._device_batch(t[1])),
                depth=self.tcfg.prefetch_depth)
        else:
            batches = ((eid, self._device_batch(b))
                       for eid, b in host_batches())
        for eid, dev_batch in batches:
            training_mode, scheme_id = self._sample_modes()
            use_mtm = scheme_id is not None
            step = self._get_train_step(training_mode, use_mtm)
            self.state, loss = step(
                self.state, dev_batch,
                jnp.asarray(scheme_id if use_mtm else 0, jnp.int32),
                jnp.asarray(self.eid_to_sid[eid], jnp.int32),
                self.base_key)
            losses.append(loss)
        train_loss = float(jnp.stack(losses).sum()) if losses else 0.0
        return {"train_loss": train_loss,
                "train_loss_avg": train_loss / max(len(losses), 1)}

    def _stack_groups(self) -> List[Tuple[str, ...]]:
        """Train eids grouped by device-resident array signature (one
        group per padded-shape bucket — ``build_multisession_loaders
        (n_buckets=...)``). Group order follows first appearance in
        ``train_loaders`` so schedules are deterministic."""
        groups: Dict[tuple, List[str]] = {}
        for e, l in self.train_loaders.items():
            sig = tuple((l.arrays[k].shape[1:], l.arrays[k].dtype.str)
                        for k in self._DR_KEYS)
            groups.setdefault(sig, []).append(e)
        return [tuple(v) for v in groups.values()]

    def _stacked_train_data(self, eids: Optional[Tuple[str, ...]] = None):
        """``eids``' train splits concatenated along the trial axis in ONE
        resident HBM block, plus per-eid trial offsets. The eids must share
        padded shapes (one bucket — ``_stack_groups`` rows qualify;
        default: all sessions, which requires ``_can_stack()``). Cached
        per eid-tuple against the exact loader objects."""
        eids = tuple(self.train_loaders) if eids is None else tuple(eids)
        loaders = tuple(self.train_loaders[e] for e in eids)
        cache = getattr(self, "_stacked_train_cache", None)
        if cache is None:
            cache = self._stacked_train_cache = {}
        hit = cache.get(eids)
        if (hit is not None and len(hit[0]) == len(loaders)
                and all(a is b for a, b in zip(hit[0], loaders))):
            return hit[1], hit[2]
        host = {k: np.concatenate([np.asarray(l.arrays[k]) for l in loaders],
                                  axis=0)
                for k in self._DR_KEYS}
        # per-trial session id rides the block so mixed-session batches can
        # gather a (B,) sid alongside the trial data (same idx, same take)
        host["session_ids"] = np.concatenate(
            [np.full(len(l.arrays["spikes_data"]),
                     self.eid_to_sid[e], np.int32)
             for e, l in zip(eids, loaders)])
        data = {k: jnp.asarray(v) for k, v in host.items()}
        if self.mesh is not None:
            from ..parallel import replicated_sharding
            data = jax.device_put(data, replicated_sharding(self.mesh))
        offsets, pos = {}, 0
        for e, l in zip(eids, loaders):
            offsets[e] = pos
            pos += len(l.arrays["spikes_data"])
        cache[eids] = (loaders, data, offsets)
        return data, offsets

    def _can_stack(self) -> bool:
        """True when every train session's per-trial arrays agree in
        trailing shape and dtype for all device-resident keys."""
        loaders = list(self.train_loaders.values())
        for k in self._DR_KEYS:
            sigs = {(l.arrays[k].shape[1:], l.arrays[k].dtype.str)
                    for l in loaders}
            if len(sigs) > 1:
                return False
        return True

    def _get_multi_step_dr(self, training_mode, use_mtm,
                           per_step_session: bool = False):
        """K optimizer steps per dispatch via lax.scan.

        ``per_step_session=False``: one session's index batches per
        dispatch — ``sids`` is a scalar fixed for the whole scan (sessions
        in different neuron buckets have different padded shapes, so they
        cannot share a scan). ``per_step_session=True``: the STACKED
        multi-session block — the per-step xs carry ``(idx, valid,
        scheme_id, session_id)``, so one compiled scan serves batches from
        any mix of sessions; the stitched tokenizer/head gather and the
        region-table row select ride the traced ``session_id`` exactly as
        the single-step program's do."""
        key = ("ms-dr-scan-stacked" if per_step_session else "ms-dr-scan",
               training_mode, use_mtm)
        if key in self._train_steps:
            return self._train_steps[key]

        mtm_modes = tuple(self.masking_schemes or ())
        table = self.region_table

        @partial(jax.jit, donate_argnums=(0,))
        def multi_step(state, data, idxs, valids, schemes, sids, base_key):
            def body(st, xs):
                if per_step_session:
                    idx, valid, scheme_id, session_id = xs
                else:
                    (idx, valid, scheme_id), session_id = xs, sids
                batch = self._gather_batch(data, idx, valid)
                return self._grad_scan_step(
                    st, batch, scheme_id, training_mode, use_mtm, mtm_modes,
                    table.select(session_id), base_key,
                    session_id=session_id,
                    space_attn_mask=batch["space_attn_mask"])

            xs = ((idxs, valids, schemes, sids) if per_step_session
                  else (idxs, valids, schemes))
            state, losses = jax.lax.scan(body, state, xs)
            return state, losses

        self._train_steps[key] = self._tp_wrap(multi_step)
        return self._train_steps[key]

    def _get_mixed_step_dr(self, training_mode, use_mtm, scan: bool):
        """Session-MIXED batch programs over the stacked resident block
        (TrainerConfig.mixed_session_batches): the (B,) per-sample session
        ids are gathered on device from the block's ``session_ids`` row by
        the same trial indices as the data, and flow through the stitched
        tokenizer/head (batched GEMMs), session embedding, and region-table
        select as a per-sample operand. ``scan=True`` is the K-step
        lax.scan variant (xs carry idx/valid/scheme per step)."""
        key = ("ms-dr-mixed-scan" if scan else "ms-dr-mixed",
               training_mode, use_mtm)
        if key in self._train_steps:
            return self._train_steps[key]

        mtm_modes = tuple(self.masking_schemes or ())
        table = self.region_table

        def one_step(st, data, idx, valid, scheme_id, base_key):
            batch = self._gather_batch(data, idx, valid)
            sids = jnp.take(data["session_ids"], idx)
            return self._grad_scan_step(
                st, batch, scheme_id, training_mode, use_mtm, mtm_modes,
                table.select(sids), base_key, session_id=sids,
                space_attn_mask=batch["space_attn_mask"])

        if scan:
            @partial(jax.jit, donate_argnums=(0,))
            def step(state, data, idxs, valids, schemes, base_key):
                def body(st, xs):
                    idx, valid, scheme_id = xs
                    return one_step(st, data, idx, valid, scheme_id,
                                    base_key)
                return jax.lax.scan(body, state, (idxs, valids, schemes))
        else:
            @partial(jax.jit, donate_argnums=(0,))
            def step(state, data, idx, valid, scheme_id, base_key):
                return one_step(state, data, idx, valid, scheme_id,
                                base_key)

        self._train_steps[key] = self._tp_wrap(step)
        return self._train_steps[key]

    # ------------------------------------------------------------------
    # DP-sharded resident blocks (TrainerConfig.shard_resident_sessions):
    # past ~380 resident sessions one replicated block exceeds per-chip
    # HBM; here each DP shard holds only ITS sessions' trials and batches
    # gather shard-locally (docs/parallelism.md).
    # ------------------------------------------------------------------

    def _shard_assignment(self, eids: Tuple[str, ...]):
        """Greedy balanced assignment of ``eids`` to the mesh's dp shards
        (largest-trials-first into the lightest shard). Deterministic from
        loader metadata every process holds, so hosts agree without
        communication. Returns (shard_eids, L) with L = the padded
        per-shard row count (max shard load)."""
        dp = int(self.mesh.shape["data"])
        order = sorted(eids, key=lambda e: (-self.train_loaders[e].n_trials,
                                            e))
        shard_eids: List[List[str]] = [[] for _ in range(dp)]
        load = [0] * dp
        for e in order:
            s = min(range(dp), key=lambda t: (load[t], t))
            shard_eids[s].append(e)
            load[s] += self.train_loaders[e].n_trials
        return [tuple(s) for s in shard_eids], max(max(load), 1)

    def _sharded_train_data(self, eids: Tuple[str, ...]):
        """One bucket's resident block SHARDED over the 'data' axis:
        global leading dim dp*L, shard s = rows [s*L, (s+1)*L) holding
        shard s's sessions' trials (zero-padded to L — padded rows are
        never sampled). Built with
        ``jax.make_array_from_process_local_data`` so each process
        materializes only the rows its local devices own: resident HBM
        and host RAM scale 1/n_hosts with session count. Returns
        (data, shard_eids, pools) where pools[s] = shard s's real trial
        count."""
        eids = tuple(eids)
        cache = getattr(self, "_sharded_train_cache", None)
        if cache is None:
            cache = self._sharded_train_cache = {}
        if eids in cache:
            return cache[eids]
        shard_eids, L = self._shard_assignment(eids)
        dp = len(shard_eids)
        sh = jax.sharding.NamedSharding(self.mesh,
                                        jax.sharding.PartitionSpec("data"))
        pid = jax.process_index()
        devs = self.mesh.devices  # (dp,) or (dp, tp)
        owned = [s for s in range(dp)
                 if any(d.process_index == pid
                        for d in np.atleast_1d(devs[s]))]

        def shard_rows(s: int, k: str) -> np.ndarray:
            parts = [np.asarray(self.train_loaders[e].arrays[k])
                     if k != "session_ids"
                     else np.full(self.train_loaders[e].n_trials,
                                  self.eid_to_sid[e], np.int32)
                     for e in shard_eids[s]]
            block = (np.concatenate(parts, axis=0) if parts
                     else np.zeros((0,), np.int32))
            pad = L - block.shape[0]
            if parts and pad:
                block = np.concatenate(
                    [block, np.zeros((pad,) + block.shape[1:],
                                     block.dtype)], axis=0)
            elif not parts:
                ref_e = eids[0]
                ref = (np.asarray(self.train_loaders[ref_e].arrays[k])
                       if k != "session_ids"
                       else np.zeros(1, np.int32))
                block = np.zeros((L,) + ref.shape[1:], ref.dtype)
            return block

        data = {}
        for k in self._DR_KEYS + ("session_ids",):
            local = np.concatenate([shard_rows(s, k) for s in owned], axis=0)
            data[k] = jax.make_array_from_process_local_data(sh, local)
        pools = [sum(self.train_loaders[e].n_trials for e in grp)
                 for grp in shard_eids]
        cache[eids] = (data, shard_eids, pools)
        return cache[eids]

    def _get_sharded_mixed_step_dr(self, training_mode, use_mtm, scan: bool):
        """Session-mixed step over a DP-SHARDED resident block: ``idx`` is
        a (B,) vector whose segment s carries LOCAL row offsets into shard
        s, gathered under ``shard_map`` so every trial read stays on the
        device that owns it — the batch lands already 'data'-sharded for
        the DP compute, zero collective traffic for data. Batches are
        always full (shards cycle their pools), so no valid-masking."""
        key = ("ms-dr-shard-scan" if scan else "ms-dr-shard",
               training_mode, use_mtm)
        if key in self._train_steps:
            return self._train_steps[key]

        mtm_modes = tuple(self.masking_schemes or ())
        table = self.region_table
        mesh = self.mesh
        pspec = jax.sharding.PartitionSpec("data")

        def gather_local(data, idx):
            take = lambda d, i: jax.tree_util.tree_map(
                lambda v: jnp.take(v, i, axis=0), d)
            return jax.shard_map(take, mesh=mesh, in_specs=(pspec, pspec),
                                 out_specs=pspec, check_vma=False)(data, idx)

        def one_step(st, data, idx, scheme_id, base_key):
            batch = gather_local(data, idx)
            sids = batch.pop("session_ids")
            return self._grad_scan_step(
                st, batch, scheme_id, training_mode, use_mtm, mtm_modes,
                table.select(sids), base_key, session_id=sids,
                space_attn_mask=batch["space_attn_mask"])

        if scan:
            @partial(jax.jit, donate_argnums=(0,))
            def step(state, data, idxs, schemes, base_key):
                def body(st, xs):
                    idx, scheme_id = xs
                    return one_step(st, data, idx, scheme_id, base_key)
                return jax.lax.scan(body, state, (idxs, schemes))
        else:
            @partial(jax.jit, donate_argnums=(0,))
            def step(state, data, idx, scheme_id, base_key):
                return one_step(state, data, idx, scheme_id, base_key)

        self._train_steps[key] = self._tp_wrap(step)
        return self._train_steps[key]

    def _train_epoch_dr_mixed_sharded(self, epoch: int, K: int):
        """Sharded-block variant of the mixed epoch: per bucket, each DP
        shard contributes B/dp trials per step from ITS sessions
        (stratified batches; within-shard uniform without replacement,
        pools reshuffled per cycle). Steps per bucket = ceil(total/B), so
        shards lighter than average cycle early and heavier ones leave a
        tail unsampled this epoch — exact per-epoch coverage returns when
        shard loads balance (the assignment is greedy-balanced). The whole
        schedule derives from (seed, epoch), identical on every host."""
        groups = self._stack_groups()
        B = self.train_loaders[next(iter(self.train_loaders))].batch_size
        dp = int(self.mesh.shape["data"])
        if B % dp:
            raise ValueError(f"batch_size {B} must divide by dp={dp}")
        bq = B // dp
        use_mtm = bool(self.masking_schemes)
        blocks, step_groups = {}, []
        for gi, eids in enumerate(groups):
            data, shard_eids, pools = self._sharded_train_data(eids)
            blocks[gi] = data
            n_steps = -(-sum(pools) // B)
            # per-shard without-replacement streams, reshuffled per cycle
            streams = []
            for s, pool in enumerate(pools):
                rows = []
                cyc = 0
                while len(rows) < n_steps * bq:
                    rng = np.random.default_rng(
                        (self.tcfg.seed, epoch, 17, gi, s, cyc))
                    rows.extend(rng.permutation(max(pool, 1)).tolist())
                    cyc += 1
                streams.append(rows)
            batches = []
            for t in range(n_steps):
                idx = np.concatenate([
                    np.asarray(streams[s][t * bq:(t + 1) * bq], np.int64)
                    for s in range(dp)])
                batches.append(idx)
            for start in range(0, len(batches), K):
                step_groups.append((gi, batches[start:start + K]))
        if len(groups) > 1:
            np.random.default_rng(
                (self.tcfg.seed, epoch, 13)).shuffle(step_groups)
        sh_idx = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec("data"))
        losses = []
        for gi, group in step_groups:
            data = blocks[gi]
            if len(group) < K or K == 1:
                for idx in group:
                    training_mode, scheme_id = self._sample_modes()
                    step = self._get_sharded_mixed_step_dr(
                        training_mode, use_mtm, scan=False)
                    self.state, loss = step(
                        self.state, data, jax.device_put(idx, sh_idx),
                        jnp.asarray(scheme_id if scheme_id is not None
                                    else 0, jnp.int32), self.base_key)
                    losses.append(jnp.atleast_1d(loss))
                continue
            training_mode, schemes = self._sample_group_modes(len(group))
            mstep = self._get_sharded_mixed_step_dr(training_mode, use_mtm,
                                                    scan=True)
            idxs = jax.device_put(
                np.stack(group),
                jax.sharding.NamedSharding(
                    self.mesh,
                    jax.sharding.PartitionSpec(None, "data")))
            self.state, ls = mstep(self.state, data, idxs,
                                   jnp.asarray(schemes, jnp.int32),
                                   self.base_key)
            losses.append(ls)
        train_loss = (float(jnp.concatenate(losses).sum())
                      if losses else 0.0)
        n_steps = sum(len(l) for l in losses)
        return {"train_loss": train_loss,
                "train_loss_avg": train_loss / max(n_steps, 1)}

    def _train_epoch_dr_mixed(self, epoch: int, K: int):
        """Session-mixed device-resident epoch: per shape bucket, ONE
        deterministic permutation of the bucket's train trials, cut into
        always-full B-batches (one short tail per bucket, valid-masked).
        Each batch mixes the bucket's sessions freely; host RNG draws one
        scheme per step (one objective per K-group with mixed training),
        matching the stacked path. With ``n_buckets > 1`` the buckets'
        K-groups interleave under a deterministic (seed, epoch) shuffle —
        one compiled program per bucket width, narrow buckets skipping the
        widest bucket's tokenizer/head padding FLOPs entirely."""
        groups = self._stack_groups()
        B = self.train_loaders[next(iter(self.train_loaders))].batch_size
        use_mtm = bool(self.masking_schemes)
        blocks, step_groups = {}, []
        for gi, eids in enumerate(groups):
            data, _ = self._stacked_train_data(eids)
            blocks[gi] = data
            total = int(data["session_ids"].shape[0])
            rng = np.random.default_rng(
                (self.tcfg.seed, epoch, 11) if len(groups) == 1
                else (self.tcfg.seed, epoch, 11, gi))
            perm = rng.permutation(total)
            batches = []
            for s in range(0, total, B):
                chunk = perm[s:s + B]
                valid = np.ones(B, np.float32)
                if len(chunk) < B:
                    valid[len(chunk):] = 0.0
                    chunk = np.pad(chunk, (0, B - len(chunk)))
                batches.append((chunk.astype(np.int64), valid))
            for start in range(0, len(batches), K):
                step_groups.append((gi, batches[start:start + K]))
        if len(groups) > 1:
            np.random.default_rng(
                (self.tcfg.seed, epoch, 13)).shuffle(step_groups)
        losses = []
        for gi, group in step_groups:
            data = blocks[gi]
            if len(group) < K or K == 1:
                for idx, valid in group:
                    training_mode, scheme_id = self._sample_modes()
                    step = self._get_mixed_step_dr(training_mode, use_mtm,
                                                   scan=False)
                    self.state, loss = step(
                        self.state, data, jnp.asarray(idx),
                        jnp.asarray(valid),
                        jnp.asarray(scheme_id if scheme_id is not None
                                    else 0, jnp.int32), self.base_key)
                    losses.append(jnp.atleast_1d(loss))
                continue
            training_mode, schemes = self._sample_group_modes(len(group))
            mstep = self._get_mixed_step_dr(training_mode, use_mtm,
                                            scan=True)
            self.state, ls = mstep(
                self.state, data,
                jnp.asarray(np.stack([g[0] for g in group])),
                jnp.asarray(np.stack([g[1] for g in group])),
                jnp.asarray(schemes, jnp.int32), self.base_key)
            losses.append(ls)
        train_loss = (float(jnp.concatenate(losses).sum())
                      if losses else 0.0)
        n_steps = sum(len(l) for l in losses)
        return {"train_loss": train_loss,
                "train_loss_avg": train_loss / max(n_steps, 1)}

    def _train_epoch_dr(self, epoch: int):
        """Device-resident epoch: every session's split lives in HBM (one
        upload, cached across epochs); the host sends only (B,) index
        vectors. HBM budget is ~100 MB per 1k trials per session — for
        hundreds of sessions use the streaming path instead.

        ``steps_per_dispatch=K > 1`` scans K consecutive same-session
        steps per dispatch: the epoch schedule interleaves sessions at
        K-step-group granularity (sessions in different buckets cannot
        share one scan), the mixed-training objective is sampled once per
        group and MtM scheme ids remain per-step traced operands —
        matching the single-session semantics (TrainerConfig).

        When every session shares one padded shape (``_can_stack``) and
        ``stacked_scan`` is on, scan groups instead cross session
        boundaries over ONE stacked resident block
        (``_train_epoch_dr_stacked``) — the K=1 interleave schedule is
        preserved exactly, so without mixed objectives the trajectory is
        bit-identical to K=1 while cutting dispatches by K×. The
        per-session grouping below remains the fallback for heterogeneous
        neuron buckets."""
        K = max(1, self.tcfg.steps_per_dispatch)
        if self.tcfg.mixed_session_batches:
            # batches mix sessions within a shape bucket; heterogeneous
            # buckets each get their own block + compiled program
            if self.tcfg.shard_resident_sessions:
                if self.mesh is None:
                    raise ValueError(
                        "shard_resident_sessions needs a mesh with a "
                        "'data' axis (build_mesh)")
                return self._train_epoch_dr_mixed_sharded(epoch, K)
            return self._train_epoch_dr_mixed(epoch, K)
        if K > 1:
            if self.tcfg.stacked_scan and self._can_stack():
                return self._train_epoch_dr_stacked(epoch, K)
            return self._train_epoch_dr_scan(epoch, K)
        iters = {}
        for e, loader in self.train_loaders.items():
            loader.set_epoch(epoch)
            iters[e] = loader.iter_index_batches()
        losses = []
        for eid in self._epoch_schedule(epoch):
            idx, valid, _ = next(iters[eid])
            data = self._device_data(self.train_loaders[eid])
            training_mode, scheme_id = self._sample_modes()
            use_mtm = scheme_id is not None
            step = self._get_train_step_dr(training_mode, use_mtm)
            self.state, loss = step(
                self.state, data, jnp.asarray(idx), jnp.asarray(valid),
                jnp.asarray(scheme_id if use_mtm else 0, jnp.int32),
                jnp.asarray(self.eid_to_sid[eid], jnp.int32),
                self.base_key)
            losses.append(loss)
        train_loss = float(jnp.stack(losses).sum()) if losses else 0.0
        return {"train_loss": train_loss,
                "train_loss_avg": train_loss / max(len(losses), 1)}

    def _train_epoch_dr_stacked(self, epoch: int, K: int):
        """Cross-session scan groups over the stacked resident block.

        The step sequence is EXACTLY the K=1 path's ``_epoch_schedule``
        interleave (each eid once per batch its loader yields, shuffled
        from (seed, epoch)); local trial indices shift by the session's
        offset into the stacked block. Host RNG consumption matches K=1
        per step (one scheme draw when MtM is on), so without
        ``mixed_training`` the optimizer trajectory is bit-identical to
        K=1 (tested). With ``mixed_training`` the objective is sampled
        once per K-group — the same documented semantics as the
        per-session scan path."""
        data, offsets = self._stacked_train_data()
        iters = {}
        for e, loader in self.train_loaders.items():
            loader.set_epoch(epoch)
            iters[e] = loader.iter_index_batches()
        steps = []
        for eid in self._epoch_schedule(epoch):
            idx, valid, _ = next(iters[eid])
            steps.append((self.eid_to_sid[eid], idx + offsets[eid], valid))
        use_mtm = bool(self.masking_schemes)
        losses = []
        for start in range(0, len(steps), K):
            chunk = steps[start:start + K]
            if len(chunk) < K:  # remainder: single-step program (avoids a
                for sid, gidx, valid in chunk:  # per-length scan compile)
                    training_mode, scheme_id = self._sample_modes()
                    step = self._get_train_step_dr(training_mode, use_mtm)
                    self.state, loss = step(
                        self.state, data, jnp.asarray(gidx),
                        jnp.asarray(valid),
                        jnp.asarray(scheme_id if scheme_id is not None
                                    else 0, jnp.int32),
                        jnp.asarray(sid, jnp.int32), self.base_key)
                    losses.append(jnp.atleast_1d(loss))
                continue
            training_mode, schemes = self._sample_group_modes(len(chunk))
            mstep = self._get_multi_step_dr(training_mode, use_mtm,
                                            per_step_session=True)
            self.state, ls = mstep(
                self.state, data,
                jnp.asarray(np.stack([c[1] for c in chunk])),
                jnp.asarray(np.stack([c[2] for c in chunk])),
                jnp.asarray(schemes, jnp.int32),
                jnp.asarray(np.asarray([c[0] for c in chunk], np.int32)),
                self.base_key)
            losses.append(ls)
        train_loss = (float(jnp.concatenate(losses).sum())
                      if losses else 0.0)
        n_steps = sum(len(l) for l in losses)
        return {"train_loss": train_loss,
                "train_loss_avg": train_loss / max(n_steps, 1)}

    def _train_epoch_dr_scan(self, epoch: int, K: int):
        losses = []
        groups = []  # (eid, [(idx, valid), ...K])
        for e, loader in self.train_loaders.items():
            loader.set_epoch(epoch)
            batches = [(idx, valid)
                       for idx, valid, _ in loader.iter_index_batches()]
            for i in range(0, len(batches), K):
                groups.append((e, batches[i:i + K]))
        rng = np.random.default_rng((self.tcfg.seed, epoch, 7))
        rng.shuffle(groups)
        for eid, chunk in groups:
            data = self._device_data(self.train_loaders[eid])
            sid = jnp.asarray(self.eid_to_sid[eid], jnp.int32)
            if len(chunk) < K:  # remainder: single-step program (avoids a
                for idx, valid in chunk:   # fresh scan compile per length)
                    training_mode, scheme_id = self._sample_modes()
                    use_mtm = scheme_id is not None
                    step = self._get_train_step_dr(training_mode, use_mtm)
                    self.state, loss = step(
                        self.state, data, jnp.asarray(idx),
                        jnp.asarray(valid),
                        jnp.asarray(scheme_id if use_mtm else 0, jnp.int32),
                        sid, self.base_key)
                    losses.append(jnp.atleast_1d(loss))
                continue
            training_mode, schemes = self._sample_group_modes(len(chunk))
            use_mtm = bool(self.masking_schemes)
            mstep = self._get_multi_step_dr(training_mode, use_mtm)
            idxs = jnp.asarray(np.stack([c[0] for c in chunk]))
            valids = jnp.asarray(np.stack([c[1] for c in chunk]))
            self.state, ls = mstep(self.state, data, idxs, valids,
                                   jnp.asarray(schemes, jnp.int32), sid,
                                   self.base_key)
            losses.append(ls)
        train_loss = (float(jnp.concatenate(losses).sum())
                      if losses else 0.0)
        n_steps = sum(len(l) for l in losses)
        return {"train_loss": train_loss,
                "train_loss_avg": train_loss / max(n_steps, 1)}

    def eval_epoch(self):
        """Per-session metric accumulation (reference keys session results
        by neuron count, ``trainer/base.py:208-263``; eids are the stable
        analog)."""
        if not self.eval_loaders:
            return None
        self._reseed_host_rng(0, tag=1)   # fixed eval stream (trainer.py)
        losses, results_list = [], []
        per_session: Dict[str, Dict[str, float]] = {}
        gt_all, preds_all = {}, {}
        eval_key = jax.random.fold_in(self.base_key, 10_000_000)
        for eid, loader in self.eval_loaders.items():
            sid = jnp.asarray(self.eid_to_sid[eid], jnp.int32)
            acc = {mod: {"gt": [], "preds": []}
                   for mod in self.modal_filter["output"]}
            n_real_neurons = None
            if self.tcfg.device_resident_data:
                data = self._device_data(loader)
                space = np.asarray(loader.arrays["space_attn_mask"][0])
                zeros = np.nonzero(space == 0)[0]
                n_real_neurons = (int(zeros.min()) if len(zeros)
                                  else space.shape[-1])
                for idx, valid, n_real in loader.iter_index_batches():
                    training_mode, scheme_id = self._sample_modes()
                    use_mtm = scheme_id is not None
                    step = self._get_eval_step_dr(training_mode, use_mtm)
                    loss, mod_preds, mod_targets = step(
                        self.state.params, data, jnp.asarray(idx),
                        jnp.asarray(valid),
                        jnp.asarray(scheme_id if use_mtm else 0, jnp.int32),
                        sid, eval_key)
                    losses.append(loss)
                    for mod in self.modal_filter["output"]:
                        acc[mod]["gt"].append((mod_targets[mod], n_real))
                        acc[mod]["preds"].append((mod_preds[mod], n_real))
            else:
                for batch in loader:
                    training_mode, scheme_id = self._sample_modes()
                    use_mtm = scheme_id is not None
                    step = self._get_eval_step(training_mode, use_mtm)
                    loss, mod_preds, mod_targets = step(
                        self.state.params, self._device_batch(batch),
                        jnp.asarray(scheme_id if use_mtm else 0, jnp.int32),
                        sid, eval_key)
                    losses.append(loss)
                    n_real = int(batch.get("n_real",
                                           len(batch["spikes_data"])))
                    space = np.asarray(batch["space_attn_mask"][0])
                    zeros = np.nonzero(space == 0)[0]
                    n_real_neurons = (int(zeros.min()) if len(zeros)
                                      else space.shape[-1])
                    for mod in self.modal_filter["output"]:
                        acc[mod]["gt"].append((mod_targets[mod], n_real))
                        acc[mod]["preds"].append((mod_preds[mod], n_real))

            gt_all[eid], preds_all[eid] = {}, {}
            per_session[eid] = {}
            for mod in self.modal_filter["output"]:
                _gt = np.concatenate(
                    [np.asarray(a)[:n] for a, n in acc[mod]["gt"]], axis=0)
                _pr = np.concatenate(
                    [np.asarray(a)[:n] for a, n in acc[mod]["preds"]], axis=0)
                if mod == "ap":
                    _gt = _gt[:, :, :n_real_neurons]
                    _pr = np.exp(_pr[:, :, :n_real_neurons])
                    active = np.argsort(_gt.sum((0, 1)))[::-1][:50].tolist()
                    res = metrics_list(_gt[:, :, active].transpose(2, 1, 0),
                                       _pr[:, :, active].transpose(2, 1, 0),
                                       metrics=["r2"])
                    per_session[eid]["ap_bps"] = bits_per_spike(_pr, _gt)
                    per_session[eid]["ap_r2"] = res["r2"]
                else:
                    res = metrics_list(_gt, _pr, metrics=[self.metric])
                    per_session[eid][f"{mod}_{self.metric}"] = \
                        res[self.metric]
                gt_all[eid][mod], preds_all[eid][mod] = _gt, _pr
                results_list.append(res[self.metric])

        eval_loss = float(jnp.stack(losses).sum()) if losses else 0.0
        return {
            "eval_loss": eval_loss,
            f"eval_trial_avg_{self.metric}": float(np.nanmean(results_list)),
            "eval_per_session": per_session,
            "eval_gt": gt_all,
            "eval_preds": preds_all,
        }
