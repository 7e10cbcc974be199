"""Trainer layer: jitted train/eval steps, MtM scheduling, DP over a mesh.

Behavioral rebuild of the reference trainer
(``/root/reference/src/trainer/base.py``) with TPU-first execution:

- **One compiled step per (training-objective, masking-path).** The reference
  re-randomizes the MtM masking scheme and the mixed-training objective per
  batch host-side (``trainer/base.py:186-190``). Here the objective
  ('encoding'/'decoding'/'token_masking') stays a static argument (3 cheap
  compilations), while the MtM scheme rides a *traced* ``scheme_id`` through
  ``lax.switch`` (ops/masking.apply_mask_by_id) so every scheme shares one
  program.
- **mod_dict contract parity.** ``_build_mod_inputs`` reproduces
  ``_forward_model_outputs`` (``trainer/base.py:51-103``): per-objective
  eval-mask construction, and `masking_mode` taking precedence over
  ``eval_mask`` whenever ``mask_type == "input"`` (``mm.py:256-263``).
- **Data parallelism** via ``jax.sharding``: params replicated, batch sharded
  on the mesh 'data' axis; XLA inserts the gradient all-reduce over ICI. No
  hand-written collectives.
- **Keyed RNG.** The reference leans on global python/torch RNG; here every
  stochastic choice derives from ``fold_in(base_key, step)`` so runs are
  reproducible per (seed, step) and identical across hosts (SURVEY.md §7
  "RNG discipline").
- **Checkpoints** are orbax pytrees {params, opt_state, step, epoch} with
  best-on-eval-trial-avg-R² selection (``trainer/base.py:116-120``) instead
  of whole-module pickles.
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax.training import train_state

from ..data.loader import DataLoader
from ..eval.metrics import metrics_list
from ..models.baseline import BaselineOutput
from ..models.multimodal import ModalityInput, MultiModalOutput
from ..ops.masking import RegionSets
from .checkpoint import save_checkpoint
from .logging import MetricLogger
from .schedule import OptimizerConfig, make_optimizer

TRAINING_SCHEMES = ("encoding", "decoding", "token_masking")


class TrainState(train_state.TrainState):
    pass


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    """Static trainer hyperparameters (configs/multi_modal/trainer_mm.yaml)."""

    num_epochs: int = 2000
    mask_type: str = "embd"                  # "embd" | "input" (MtM)
    mask_mode: Tuple[str, ...] = ("temporal",)
    mixed_training: bool = False
    save_every: int = 100
    eval_every: int = 1
    save_plot_every_n_epochs: int = 0    # 0 disables figure dumps
    metric: str = "r2"
    seed: int = 42
    log_dir: str = "results"
    mask_regions: Tuple[str, ...] = ("all",)
    target_regions: Tuple[str, ...] = ("all",)
    # upload each split to HBM once and gather batches on device by index;
    # removes the per-batch host->device transfer from the training loop
    # (measured 10x in-loop throughput through a remote/tunneled backend)
    device_resident_data: bool = False
    # >0: place batches N ahead on a daemon thread (flax prefetch_to_device
    # pattern) for streaming loaders on direct-attached TPUs. Default off:
    # through a tunneled backend the background device_put contends with
    # step dispatch on the same connection and measurably HURTS (RESULTS.md)
    prefetch_depth: int = 0
    # device-resident path only: lax.scan K optimizer steps per dispatch,
    # amortizing per-call dispatch latency. MtM scheme ids still vary per
    # step (traced); with mixed_training the objective is sampled once per
    # K-step group instead of per step (semantics documented in RESULTS.md)
    steps_per_dispatch: int = 1
    # multi-session device-resident path only: when every session pads to
    # the same shapes (one N_max bucket — what build_multisession_loaders
    # produces), concatenate all sessions' splits into ONE resident block
    # and let steps_per_dispatch scan groups CROSS session boundaries (the
    # session id is a per-step traced operand). Removes the per-session
    # dispatch floor at many-sessions/few-trials scale; False falls back
    # to per-session scan groups for A/B.
    stacked_scan: bool = True
    # multi-session stacked path only: draw each batch's B trials from the
    # WHOLE stacked block instead of one session — the session id becomes a
    # per-SAMPLE (B,) operand through the stitched tokenizer/head gathers
    # (batched GEMMs), the session embedding, and the region table. Fixes
    # the many-sessions/few-trials regime: batches stay full at any B, so
    # the per-step fixed costs (stitched-stack gradient scatter + optimizer
    # update over the (S, ...) parameter stacks) amortize over B full
    # samples. New capability beyond the reference (its sampler groups
    # same-session trials only — loader/base.py:150-179).
    mixed_session_batches: bool = False
    # mixed_session_batches + mesh only: shard each resident block over the
    # 'data' axis instead of replicating it — sessions are assigned to DP
    # shards (balanced by trial count) and every process materializes ONLY
    # its own shards' sessions (jax.make_array_from_process_local_data), so
    # resident HBM and host RAM scale 1/n_hosts with session count (the
    # >380-session regime, docs/parallelism.md). Each batch is then
    # STRATIFIED: B/dp trials drawn per shard from that shard's sessions
    # (a shard_map gather — zero cross-device traffic), vs. the replicated
    # path's global uniform draw. Shards cycle their pools independently,
    # so per-epoch trial coverage is exact only when shard loads balance.
    shard_resident_sessions: bool = False
    # >0: retry a compiled step's first call when it dies on a TRANSIENT
    # remote-compile abort (tunneled backends; utils/prewarm.py). Big
    # programs (K=32 scans, B=256 mixed steps) otherwise go unmeasured on
    # flaky remote-compile windows. 0 = raise immediately (default).
    compile_retries: int = 0

    @classmethod
    def from_config(cls, cfg, **overrides) -> "TrainerConfig":
        """Build from a loaded trainer YAML (trainer_mm.yaml semantics).

        Every documented trainer knob is wired — a YAML alone can express
        a production run; entry-script kwargs remain pure overrides.
        Reference-parity keys live under ``training:`` (the reference reads
        them at ``trainer/base.py:37-48``); framework-extension keys
        (device_resident_data, steps_per_dispatch, ...) read from the same
        block with their dataclass defaults."""
        t = cfg.training
        eval_every = t.get("eval_every", None)
        kw = dict(
            num_epochs=int(t.num_epochs),
            mask_type=str(t.get("mask_type", "embd")),
            mask_mode=tuple(t.get("mask_mode", ["temporal"])),
            mixed_training=bool(t.get("mixed_training", False)),
            save_every=int(t.get("save_every", 100)),
            # reference yaml uses null for "every epoch"
            eval_every=int(eval_every) if eval_every is not None else 1,
            save_plot_every_n_epochs=int(
                t.get("save_plot_every_n_epochs", 0) or 0),
            metric=str(t.get("metric", "r2")),
            seed=int(cfg.get("seed", 42)),
            device_resident_data=bool(t.get("device_resident_data", False)),
            prefetch_depth=int(t.get("prefetch_depth", 0)),
            steps_per_dispatch=int(t.get("steps_per_dispatch", 1)),
            stacked_scan=bool(t.get("stacked_scan", True)),
            mixed_session_batches=bool(
                t.get("mixed_session_batches", False)),
            shard_resident_sessions=bool(
                t.get("shard_resident_sessions", False)),
            compile_retries=int(t.get("compile_retries", 0)),
        )
        masker = (cfg.get("model", {}) or {}).get("masker", None)
        if masker is not None:
            kw["mask_regions"] = tuple(masker.get("mask_regions", ["all"])
                                       or ["all"])
            kw["target_regions"] = tuple(masker.get("target_regions", ["all"])
                                         or ["all"])
        dirs = cfg.get("dirs", None)
        if dirs is not None and dirs.get("log_dir"):
            kw["log_dir"] = str(dirs["log_dir"])
        kw.update(overrides)
        return cls(**kw)


def _host_sample(rng: np.random.Generator, options: Sequence[str]) -> str:
    """Per-batch host-side choice (the reference's ``random.sample(x,1)[0]``,
    ``trainer/base.py:186-190``), driven by a seeded numpy generator."""
    return options[int(rng.integers(len(options)))]


def _with_tp(method):
    """Run ``method`` under this trainer's TP-attention context: any jit
    tracing inside picks up the shard_map-wrapped fused kernel when the
    mesh has a >1 'model' axis (ops/attention.py)."""

    def wrapper(self, *a, **kw):
        mesh = getattr(self, "_tp_mesh", None)
        if mesh is None:
            return method(self, *a, **kw)
        from ..ops.attention import tp_attention
        with tp_attention(mesh):
            return method(self, *a, **kw)

    wrapper.__name__ = method.__name__
    wrapper.__doc__ = method.__doc__
    return wrapper


class MultiModalTrainer:
    """Drives MultiModal training: MtM + mixed objectives, eval, checkpoints.

    ``mesh`` (optional) enables data parallelism: batches are sharded over
    the 'data' axis, parameters replicated. ``batch_size`` must then divide
    by the data-axis size.
    """

    def __init__(
        self,
        model,
        train_dataloader: DataLoader,
        eval_dataloader: Optional[DataLoader],
        optimizer_config: OptimizerConfig,
        trainer_config: TrainerConfig,
        *,
        test_dataloader: Optional[DataLoader] = None,
        modal_filter: Optional[Dict[str, List[str]]] = None,
        num_neurons: Optional[Sequence[int]] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        logger: Optional[MetricLogger] = None,
    ):
        self.model = model
        self.train_dataloader = train_dataloader
        self.eval_dataloader = eval_dataloader
        self.test_dataloader = test_dataloader
        self.ocfg = optimizer_config
        self.tcfg = trainer_config
        self.modal_filter = modal_filter or {
            "input": list(model.config.avail_mod),
            "output": list(model.config.avail_mod)}
        self.num_neurons = list(num_neurons) if num_neurons else None
        self.mesh = mesh
        from ..parallel import model_axis_size
        # TP + the fused Pallas kernel compose via shard_map over the
        # 'model' axis (heads sharded; ops/attention.py:_flash_mha_tp).
        # The context is entered around every method that may trace — for
        # the xla impl too, where it only disables the apply-time QKV
        # wide-GEMM fusion (models/layers.py) whose kernel concat would
        # otherwise cross the column-sharded 'model' axis.
        self._tp_mesh = mesh if model_axis_size(mesh) > 1 else None
        self.logger = logger or MetricLogger(trainer_config.log_dir)
        self.metric = trainer_config.metric

        self.avail_mod = list(model.config.avail_mod)
        self.mod_to_indx = {m: i for i, m in enumerate(self.avail_mod)}
        self.single_modal = len(self.modal_filter["output"]) == 1

        # MtM scheme menu (mask_type == "input"), else fixed masker config
        self.masking_schemes = (list(self.tcfg.mask_mode)
                                if self.tcfg.mask_type == "input" else None)
        self.mixed_training = self.tcfg.mixed_training

        # regions for region-conditioned masking, from the train split
        arrays = train_dataloader.arrays
        self.regions = RegionSets.build(
            arrays["region_ids"],
            mask_regions=self.tcfg.mask_regions,
            target_regions=self.tcfg.target_regions,
            region_vocab=arrays["region_vocab"])

        self.base_key = jax.random.PRNGKey(self.tcfg.seed)
        self._host_rng = np.random.default_rng(self.tcfg.seed)

        total_steps = (self.tcfg.num_epochs * self._steps_per_epoch()
                       // self.ocfg.gradient_accumulation_steps)
        self.tx, self.schedule = make_optimizer(self.ocfg, max(total_steps, 1))

        self.state = self._init_state()
        self._train_steps: Dict[Any, Any] = {}
        self._eval_steps: Dict[Any, Any] = {}
        self.session_active_neurons: List[List[int]] = []

    # ------------------------------------------------------------------
    # initialization / sharding
    # ------------------------------------------------------------------

    def _steps_per_epoch(self) -> int:
        return len(self.train_dataloader)

    def _example_batch(self) -> Dict[str, jnp.ndarray]:
        batch = next(iter(self.train_dataloader))
        return self._device_batch(batch)

    def _device_batch(self, batch) -> Dict[str, jnp.ndarray]:
        """Array-only view of a batch, placed (and DP-sharded) on device."""
        from ..parallel import shard_batch
        keys = ("spikes_data", "target", "time_attn_mask", "spikes_timestamps")
        return shard_batch({k: batch[k] for k in keys}, self.mesh)

    _DR_KEYS = ("spikes_data", "target", "time_attn_mask",
                "spikes_timestamps")

    def _device_data(self, loader) -> Dict[str, jnp.ndarray]:
        """Whole-split arrays resident in HBM (uploaded once per loader).
        Replicated over the mesh; the gathered batch is re-sharded onto
        'data' inside the step."""
        cache = getattr(self, "_device_data_cache", None)
        if cache is None:
            # keyed by the loader OBJECT (weakly): entries die with the
            # loader, so a new loader reusing a freed id() can never pick
            # up another loader's stale device arrays
            import weakref
            cache = self._device_data_cache = weakref.WeakKeyDictionary()
        if loader not in cache:
            data = {k: jnp.asarray(loader.arrays[k]) for k in self._DR_KEYS}
            if self.mesh is not None:
                from ..parallel import replicated_sharding
                data = jax.device_put(data, replicated_sharding(self.mesh))
            cache[loader] = data
        return cache[loader]

    def _gather_batch(self, data, idx, valid):
        """Device-side batch assembly: gather trials by index, zero the
        attention masks of padded tail trials (same loss-weight semantics
        as the host loader's zeroed masks)."""
        batch = {k: jnp.take(data[k], idx, axis=0) for k in self._DR_KEYS}
        batch["time_attn_mask"] = batch["time_attn_mask"] * valid[:, None]
        if "space_attn_mask" in batch:  # multisession keys
            batch["space_attn_mask"] = (batch["space_attn_mask"]
                                        * valid[:, None])
        if self.mesh is not None:
            from ..parallel import batch_sharding
            sh = batch_sharding(self.mesh)
            batch = {k: jax.lax.with_sharding_constraint(v, sh)
                     for k, v in batch.items()}
        return batch

    @_with_tp
    def _init_state(self) -> TrainState:
        batch = self._example_batch()
        mod_inputs = self._build_mod_inputs(batch, None)
        k_param, k_mask, k_drop = jax.random.split(self.base_key, 3)
        # jit the init: flax init runs eagerly otherwise, compiling every op
        # individually — minutes of per-op dispatch on remote TPU backends
        init_fn = jax.jit(partial(self.model.init, training=False))
        variables = init_fn(
            {"params": k_param, "mask": k_mask, "dropout": k_drop},
            mod_inputs)
        from ..parallel import shard_tree
        state = TrainState.create(
            apply_fn=self.model.apply, params=variables["params"], tx=self.tx)
        return shard_tree(state, self.mesh)

    def _tp_wrap(self, fn):
        """Invoke ``fn`` inside this trainer's TP-attention context so (re)
        tracing from ANY call site (epoch loops, dryruns, subclasses) picks
        up the shard_map-wrapped fused kernel. No-op without a TP mesh.
        Also applies the transient-compile retry policy
        (``TrainerConfig.compile_retries``, utils/prewarm.py)."""
        if self.tcfg.compile_retries > 0:
            from ..utils.prewarm import retry_transient
            fn = retry_transient(fn, retries=self.tcfg.compile_retries)
        if getattr(self, "_tp_mesh", None) is None:
            return fn
        from ..ops.attention import tp_attention

        def wrapped(*a, **kw):
            with tp_attention(self._tp_mesh):
                return fn(*a, **kw)

        return wrapped

    # ------------------------------------------------------------------
    # mod_dict construction (parity: trainer/base.py:51-103)
    # ------------------------------------------------------------------

    def _build_mod_inputs(self, batch: Dict[str, jnp.ndarray],
                          training_mode: Optional[str]
                          ) -> Dict[str, ModalityInput]:
        raw = {"ap": batch["spikes_data"], "behavior": batch["target"]}
        mod_inputs = {}
        for mod in self.avail_mod:
            x = raw[mod]
            if self.single_modal:
                is_out = mod in self.modal_filter["output"]
                eval_mask = (jnp.ones if is_out else jnp.zeros)(
                    x.shape, dtype=jnp.int32)
            elif training_mode == "encoding":
                eval_mask = (jnp.ones if mod == "ap" else jnp.zeros)(
                    x.shape, dtype=jnp.int32)
            elif training_mode == "decoding":
                eval_mask = (jnp.ones if mod == "behavior" else jnp.zeros)(
                    x.shape, dtype=jnp.int32)
            elif training_mode == "token_masking":
                eval_mask = None
            else:  # no mixed training: default per-mod masker sampling
                eval_mask = None
            mod_inputs[mod] = ModalityInput(
                inputs=x, targets=x,
                attn_mask=batch["time_attn_mask"],
                timestamps=batch["spikes_timestamps"],
                eval_mask=eval_mask)
        return mod_inputs

    # ------------------------------------------------------------------
    # compiled steps
    # ------------------------------------------------------------------

    def _grad_scan_step(self, st: TrainState, batch, scheme_id,
                        training_mode: Optional[str], use_mtm: bool,
                        mtm_modes, regions, base_key, **apply_kwargs):
        """One optimizer step's fold_in(step)-keyed loss/grad/update —
        the single shared body of every compiled train program (host
        batch, device-resident gather, K-step scans, and the
        multi-session fixed/per-step-session variants, which pass
        ``session_id``/``space_attn_mask`` through ``apply_kwargs``).
        The K-step-group RNG/trajectory exactness tests pin this body's
        semantics; change it here and nowhere else."""
        k = jax.random.fold_in(base_key, st.step)
        k_mask, k_drop = jax.random.split(k)

        def loss_fn(params):
            mod_inputs = self._build_mod_inputs(batch, training_mode)
            out: MultiModalOutput = st.apply_fn(
                {"params": params}, mod_inputs,
                masking_mode=scheme_id if use_mtm else None,
                mtm_modes=mtm_modes, regions=regions, training=True,
                rngs={"mask": k_mask, "dropout": k_drop}, **apply_kwargs)
            return out.loss, out

        (loss, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(st.params)
        return st.apply_gradients(grads=grads), loss

    def _get_train_step(self, training_mode: Optional[str], use_mtm: bool):
        key = (training_mode, use_mtm)
        if key in self._train_steps:
            return self._train_steps[key]

        mtm_modes = tuple(self.masking_schemes or ())
        regions = self.regions

        @partial(jax.jit, static_argnames=(), donate_argnums=(0,))
        def step(state: TrainState, batch, scheme_id, base_key):
            return self._grad_scan_step(state, batch, scheme_id,
                                        training_mode, use_mtm, mtm_modes,
                                        regions, base_key)

        self._train_steps[key] = self._tp_wrap(step)
        return self._train_steps[key]

    def _get_train_step_dr(self, training_mode: Optional[str],
                           use_mtm: bool):
        """Device-resident variant: the step takes the whole split (HBM
        resident) plus a (B,) index vector and assembles the batch with an
        on-device gather — no per-batch host->device transfer."""
        key = ("dr", training_mode, use_mtm)
        if key in self._train_steps:
            return self._train_steps[key]

        mtm_modes = tuple(self.masking_schemes or ())
        regions = self.regions

        @partial(jax.jit, donate_argnums=(0,))
        def step(state: TrainState, data, idx, valid, scheme_id, base_key):
            batch = self._gather_batch(data, idx, valid)
            return self._grad_scan_step(state, batch, scheme_id,
                                        training_mode, use_mtm, mtm_modes,
                                        regions, base_key)

        self._train_steps[key] = self._tp_wrap(step)
        return self._train_steps[key]

    def _sample_group_modes(self, n: int):
        """Host RNG draws for one K-step scan group: the objective
        (mixed_training) is sampled ONCE per group, MtM scheme ids once
        per step — the documented K-step-group semantics shared by the
        single-session and both multi-session scan paths. Draw order
        (objective first, then schemes) matches the K=1 per-step
        ``_sample_modes`` stream when mixed training is off."""
        training_mode = (_host_sample(self._host_rng, TRAINING_SCHEMES)
                         if self.mixed_training else None)
        schemes = []
        for _ in range(n):
            if self.masking_schemes:
                s = _host_sample(self._host_rng, self.masking_schemes)
                schemes.append(self.masking_schemes.index(s))
            else:
                schemes.append(0)
        return training_mode, schemes

    def _run_scan_group(self, data, group):
        """Dispatch one lax.scan of len(group) optimizer steps. The
        objective (mixed_training) is sampled once per group; MtM schemes
        are sampled per step and scanned as a traced operand."""
        training_mode, schemes = self._sample_group_modes(len(group))
        use_mtm = bool(self.masking_schemes)
        mstep = self._get_multi_step_dr(training_mode, use_mtm)
        idxs = jnp.asarray(np.stack([g[0] for g in group]))
        valids = jnp.asarray(np.stack([g[1] for g in group]))
        self.state, losses = mstep(
            self.state, data, idxs, valids,
            jnp.asarray(schemes, jnp.int32), self.base_key)
        return losses

    def _get_multi_step_dr(self, training_mode: Optional[str],
                           use_mtm: bool):
        """K optimizer steps per dispatch via lax.scan over index batches
        (device-resident path). The MtM scheme id is a scanned operand, so
        per-step scheme switching stays exact."""
        key = ("dr-scan", training_mode, use_mtm)
        if key in self._train_steps:
            return self._train_steps[key]

        mtm_modes = tuple(self.masking_schemes or ())
        regions = self.regions

        @partial(jax.jit, donate_argnums=(0,))
        def multi_step(state: TrainState, data, idxs, valids, schemes,
                       base_key):
            def body(st, xs):
                idx, valid, scheme_id = xs
                batch = self._gather_batch(data, idx, valid)
                return self._grad_scan_step(st, batch, scheme_id,
                                            training_mode, use_mtm,
                                            mtm_modes, regions, base_key)

            state, losses = jax.lax.scan(body, state,
                                         (idxs, valids, schemes))
            return state, losses

        self._train_steps[key] = self._tp_wrap(multi_step)
        return self._train_steps[key]

    def _get_eval_step_dr(self, training_mode: Optional[str], use_mtm: bool):
        key = ("dr", training_mode, use_mtm)
        if key in self._eval_steps:
            return self._eval_steps[key]

        mtm_modes = tuple(self.masking_schemes or ())
        regions = self.regions

        @jax.jit
        def step(params, data, idx, valid, scheme_id, base_key):
            batch = self._gather_batch(data, idx, valid)
            k_mask, _ = jax.random.split(base_key)
            mod_inputs = self._build_mod_inputs(batch, training_mode)
            out: MultiModalOutput = self.model.apply(
                {"params": params}, mod_inputs,
                masking_mode=scheme_id if use_mtm else None,
                mtm_modes=mtm_modes, regions=regions, training=False,
                rngs={"mask": k_mask})
            return out.loss, out.mod_preds, out.mod_targets

        self._eval_steps[key] = self._tp_wrap(step)
        return self._eval_steps[key]

    def _get_eval_step(self, training_mode: Optional[str], use_mtm: bool):
        key = (training_mode, use_mtm)
        if key in self._eval_steps:
            return self._eval_steps[key]

        mtm_modes = tuple(self.masking_schemes or ())
        regions = self.regions

        @jax.jit
        def step(params, batch, scheme_id, base_key):
            k_mask, _ = jax.random.split(base_key)
            mod_inputs = self._build_mod_inputs(batch, training_mode)
            out: MultiModalOutput = self.model.apply(
                {"params": params}, mod_inputs,
                masking_mode=scheme_id if use_mtm else None,
                mtm_modes=mtm_modes, regions=regions, training=False,
                rngs={"mask": k_mask})
            return out.loss, out.mod_preds, out.mod_targets

        self._eval_steps[key] = self._tp_wrap(step)
        return self._eval_steps[key]

    def _reseed_host_rng(self, epoch: int, tag: int = 0) -> None:
        """Host-side mode/scheme sampling is a pure function of
        (seed, epoch): a run resumed at epoch k draws exactly the stream
        the uninterrupted run would have drawn at epoch k, so ``--resume``
        is trajectory-exact under MtM / mixed training too (the device
        RNG already folds (seed, step)). ``tag`` separates the train and
        eval streams."""
        self._host_rng = np.random.default_rng((self.tcfg.seed, epoch, tag))

    def _sample_modes(self) -> Tuple[Optional[str], Optional[int]]:
        """Per-batch (training_mode, scheme_id) — host-side like the
        reference, but from the trainer's seeded generator."""
        training_mode = (_host_sample(self._host_rng, TRAINING_SCHEMES)
                         if self.mixed_training else None)
        scheme_id = None
        if self.masking_schemes:
            scheme = _host_sample(self._host_rng, self.masking_schemes)
            scheme_id = self.masking_schemes.index(scheme)
        return training_mode, scheme_id

    # ------------------------------------------------------------------
    # epochs
    # ------------------------------------------------------------------

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        self.train_dataloader.set_epoch(epoch)
        self._reseed_host_rng(epoch)
        losses = []
        if self.tcfg.device_resident_data:
            data = self._device_data(self.train_dataloader)
            K = max(1, self.tcfg.steps_per_dispatch)
            pending = []
            for idx, valid, _ in self.train_dataloader.iter_index_batches():
                if K == 1:
                    training_mode, scheme_id = self._sample_modes()
                    use_mtm = scheme_id is not None
                    step = self._get_train_step_dr(training_mode, use_mtm)
                    self.state, loss = step(
                        self.state, data, jnp.asarray(idx),
                        jnp.asarray(valid),
                        jnp.asarray(scheme_id if use_mtm else 0, jnp.int32),
                        self.base_key)
                    losses.append(loss)
                else:
                    pending.append((idx, valid))
                    if len(pending) == K:
                        losses.append(self._run_scan_group(data, pending))
                        pending = []
            for idx, valid in pending:   # remainder: single-step path
                training_mode, scheme_id = self._sample_modes()
                use_mtm = scheme_id is not None
                step = self._get_train_step_dr(training_mode, use_mtm)
                self.state, loss = step(
                    self.state, data, jnp.asarray(idx), jnp.asarray(valid),
                    jnp.asarray(scheme_id if use_mtm else 0, jnp.int32),
                    self.base_key)
                losses.append(loss)
            train_loss = float(jnp.concatenate(
                [jnp.atleast_1d(l) for l in losses]).sum()) if losses else 0.0
            n_steps = len(self.train_dataloader)
            return {"train_loss": train_loss, "train_loss_avg":
                    train_loss / max(n_steps, 1)}
        if self.tcfg.prefetch_depth > 0:
            from ..data.prefetch import DevicePrefetcher
            batches = DevicePrefetcher(self.train_dataloader,
                                       self._device_batch,
                                       depth=self.tcfg.prefetch_depth)
        else:
            batches = (self._device_batch(b) for b in self.train_dataloader)
        for dev_batch in batches:
            training_mode, scheme_id = self._sample_modes()
            use_mtm = scheme_id is not None
            step = self._get_train_step(training_mode, use_mtm)
            self.state, loss = step(
                self.state, dev_batch,
                jnp.asarray(scheme_id if use_mtm else 0, jnp.int32),
                self.base_key)
            losses.append(loss)  # stays on device: keep dispatch async
        # one host sync per epoch (per-batch float() would serialize steps)
        train_loss = float(jnp.stack(losses).sum()) if losses else 0.0
        return {"train_loss": train_loss, "train_loss_avg":
                train_loss / max(len(losses), 1)}

    def eval_epoch(self) -> Optional[Dict[str, Any]]:
        """Reference ``eval_epoch`` (``trainer/base.py:205-270``): accumulate
        gt/preds per output modality, exp() spike predictions, top-50
        most-active-neuron R² for 'ap', full R² for behavior."""
        if self.eval_dataloader is None:
            return None
        # fixed eval stream: every eval epoch draws the same mode/scheme
        # sequence (comparable metrics across epochs, resume-invariant)
        self._reseed_host_rng(0, tag=1)
        losses = []
        acc: Dict[str, Dict[str, list]] = {
            mod: {"gt": [], "preds": []} for mod in self.modal_filter["output"]}

        eval_key = jax.random.fold_in(self.base_key, 10_000_000)
        if self.tcfg.device_resident_data:
            data = self._device_data(self.eval_dataloader)
            for idx, valid, n_real in \
                    self.eval_dataloader.iter_index_batches():
                training_mode, scheme_id = self._sample_modes()
                use_mtm = scheme_id is not None
                step = self._get_eval_step_dr(training_mode, use_mtm)
                loss, mod_preds, mod_targets = step(
                    self.state.params, data, jnp.asarray(idx),
                    jnp.asarray(valid),
                    jnp.asarray(scheme_id if use_mtm else 0, jnp.int32),
                    eval_key)
                losses.append(loss)
                for mod in self.modal_filter["output"]:
                    acc[mod]["gt"].append((mod_targets[mod], n_real))
                    acc[mod]["preds"].append((mod_preds[mod], n_real))
        else:
            for batch in self.eval_dataloader:
                training_mode, scheme_id = self._sample_modes()
                use_mtm = scheme_id is not None
                step = self._get_eval_step(training_mode, use_mtm)
                dev_batch = self._device_batch(batch)
                loss, mod_preds, mod_targets = step(
                    self.state.params, dev_batch,
                    jnp.asarray(scheme_id if use_mtm else 0, jnp.int32),
                    eval_key)
                losses.append(loss)  # device-side until the epoch-end sync
                n_real = int(batch.get("n_real", len(batch["spikes_data"])))
                for mod in self.modal_filter["output"]:
                    acc[mod]["gt"].append((mod_targets[mod], n_real))
                    acc[mod]["preds"].append((mod_preds[mod], n_real))
        eval_loss = float(jnp.stack(losses).sum()) if losses else 0.0
        for mod in self.modal_filter["output"]:
            for k in ("gt", "preds"):
                acc[mod][k] = [np.asarray(a)[:n] for a, n in acc[mod][k]]

        gt, preds, results_list = {}, {}, []
        self.session_active_neurons = []
        for mod in self.modal_filter["output"]:
            _gt = np.concatenate(acc[mod]["gt"], axis=0)
            _preds = np.concatenate(acc[mod]["preds"], axis=0)
            if mod == "ap":
                _preds = np.exp(_preds)
            gt[mod], preds[mod] = _gt, _preds

            if mod == "ap":
                active = np.argsort(_gt.sum((0, 1)))[::-1][:50].tolist()
                self.session_active_neurons.append(active)
                res = metrics_list(
                    gt=_gt[:, :, active].transpose(2, 1, 0),
                    pred=_preds[:, :, active].transpose(2, 1, 0),
                    metrics=["r2"])
            else:
                res = metrics_list(gt=_gt, pred=_preds, metrics=[self.metric])
            results_list.append(res[self.metric])

        return {
            "eval_loss": eval_loss,
            f"eval_trial_avg_{self.metric}": float(np.nanmean(results_list)),
            "eval_gt": gt,
            "eval_preds": preds,
        }

    # ------------------------------------------------------------------
    # outer loop (parity: trainer/base.py:106-179)
    # ------------------------------------------------------------------

    def train(self, start_epoch: int = 0) -> Dict[str, Any]:
        """Full training loop. ``start_epoch`` > 0 resumes a restored run
        (``restore('last')`` first); the best-checkpoint watermark is
        recovered from the model_best meta sidecar so a resumed run never
        demotes an earlier best."""
        tcfg = self.tcfg
        best_eval_loss = float("inf")
        best_metric = -float("inf")
        best_epoch = -1
        if start_epoch:
            from .checkpoint import load_checkpoint_meta
            meta = load_checkpoint_meta(tcfg.log_dir, "best") or {}
            if "metric" in meta and meta["metric"] is not None:
                best_metric = float(meta["metric"])
                best_epoch = int(meta.get("epoch", -1))
        history = []

        for epoch in range(start_epoch, tcfg.num_epochs):
            t0 = time.time()
            train_res = self.train_epoch(epoch)
            eval_res = (self.eval_epoch()
                        if (epoch % tcfg.eval_every == 0) else None)
            dt = time.time() - t0

            row = {"epoch": epoch, "train_loss": train_res["train_loss"],
                   "lr": float(self.schedule(int(self.state.step))),
                   "epoch_time_s": dt}
            if eval_res:
                row["eval_loss"] = eval_res["eval_loss"]
                row[f"eval_trial_avg_{self.metric}"] = (
                    eval_res[f"eval_trial_avg_{self.metric}"])
                if "eval_per_session" in eval_res:
                    row["eval_per_session"] = eval_res["eval_per_session"]
                if eval_res[f"eval_trial_avg_{self.metric}"] > best_metric:
                    best_metric = eval_res[f"eval_trial_avg_{self.metric}"]
                    best_eval_loss = eval_res["eval_loss"]
                    best_epoch = epoch
                    self.save_model("best", epoch=epoch, metric=best_metric)
                    if tcfg.save_plot_every_n_epochs:
                        # reference plots + wandb-logs figures on every new
                        # best (trainer/base.py:121-142)
                        self._plot_epoch(eval_res, epoch, prefix="best_")
            self.logger.log(row)
            history.append(row)

            if (tcfg.save_plot_every_n_epochs and eval_res
                    and epoch % tcfg.save_plot_every_n_epochs == 0):
                self._plot_epoch(eval_res, epoch)

            if tcfg.save_every and epoch and epoch % tcfg.save_every == 0:
                self.save_model("last", epoch=epoch)

        self.save_model("last", epoch=tcfg.num_epochs - 1)
        summary = {"best_eval_loss": best_eval_loss,
                   f"best_eval_trial_avg_{self.metric}": best_metric,
                   "best_epoch": best_epoch, "history": history}
        self.logger.log({"final": True, "best_epoch": best_epoch,
                         f"best_eval_trial_avg_{self.metric}": best_metric})
        return summary

    def _plot_epoch(self, eval_res, epoch: int, prefix: str = "") -> None:
        """GT-vs-pred diagnostic figures every n epochs + on new best
        (reference ``plot_epoch``, ``trainer/base.py:121-167,272-300``);
        saved to disk AND wandb-logged as images when wandb is active."""
        import matplotlib.pyplot as plt

        from ..utils.plotting import plot_gt_pred, plot_neurons_r2
        for mod in self.modal_filter["output"]:
            gt = eval_res["eval_gt"].get(mod)
            preds = eval_res["eval_preds"].get(mod)
            if gt is None or len(gt) == 0:
                continue
            fig = plot_gt_pred(gt.mean(0).T, preds.mean(0).T,
                               epoch=epoch, modality=mod)
            fig.savefig(os.path.join(self.tcfg.log_dir,
                                     f"{prefix}gt_pred_fig_{mod}_{epoch}.png"))
            if mod == "ap" and self.session_active_neurons:
                idx = self.session_active_neurons[0][:5]
            else:
                idx = list(range(gt.shape[-1]))
            fig2 = plot_neurons_r2(gt.mean(0), preds.mean(0),
                                   neuron_idx=idx, epoch=epoch, modality=mod)
            fig2.savefig(os.path.join(self.tcfg.log_dir,
                                      f"{prefix}r2_fig_{mod}_{epoch}.png"))
            self.logger.log_figures(
                {f"{prefix}gt_pred_fig_{mod}": fig,
                 f"{prefix}r2_fig_{mod}": fig2},
                extra={"best_epoch": epoch} if prefix else None)
            plt.close("all")

    def restore(self, name: str = "last") -> int:
        """Resume from a checkpoint: params + optimizer state + step.

        Returns the epoch recorded at save time (the reference has no
        resume path at all — SURVEY.md §5; its checkpoints lack optimizer
        state entirely).
        """
        from .checkpoint import load_checkpoint_meta, restore_checkpoint
        target = {"params": self.state.params,
                  "opt_state": self.state.opt_state,
                  "step": self.state.step}
        try:
            tree = restore_checkpoint(self.tcfg.log_dir, name,
                                      target=jax.device_get(target))
            self.state = self.state.replace(
                params=tree["params"], opt_state=tree["opt_state"],
                step=jnp.asarray(tree["step"]))
        except Exception:
            # Fall back ONLY for a genuine optimizer-state structure
            # mismatch: e.g. a checkpoint saved before momentum cycling
            # (plain optax.adamw state) resumed into an inject_hyperparams
            # optimizer, or a converted reference checkpoint with params
            # only. A corrupt/partially-written checkpoint or an I/O error
            # must not be silently downgraded to a params-only resume.
            import warnings
            # A corrupt/unreadable checkpoint fails this raw restore too
            # and re-raises from here instead of being mislabeled.
            tree = restore_checkpoint(self.tcfg.log_dir, name)  # raw tree
            # container-agnostic structure check (raw orbax trees come
            # back as dicts where the target holds NamedTuples, so
            # treedefs NEVER match and can't be compared): identical
            # leaf-shape multisets mean the failure was NOT a structure
            # mismatch. Deliberate edge: a genuine structure mismatch
            # whose leaf shapes coincide re-raises the original orbax
            # error (fails loudly, describing the mismatch) instead of
            # silently downgrading to a params-only resume.
            shapes = lambda t: sorted(
                str(getattr(l, "shape", ())) for l in
                jax.tree_util.tree_leaves(t))
            same_opt = ("opt_state" in tree and
                        shapes(tree["opt_state"])
                        == shapes(target["opt_state"]))
            if same_opt or "params" not in tree:
                raise  # not a structure mismatch — surface the real error
            self.state = self.state.replace(params=tree["params"])
            if "step" in tree:
                self.state = self.state.replace(
                    step=jnp.asarray(tree["step"]))
            warnings.warn(
                f"checkpoint '{name}' has a different optimizer-state "
                "structure (pre-momentum-cycling or params-only); restored "
                "params and reinitialized the optimizer state",
                stacklevel=2)
        if self.mesh is not None:
            from ..parallel import shard_tree
            self.state = shard_tree(self.state, self.mesh)
        meta = load_checkpoint_meta(self.tcfg.log_dir, name) or {}
        return int(meta.get("epoch", 0))

    def save_model(self, name: str = "last", epoch: int = 0,
                   metric: Optional[float] = None) -> str:
        os.makedirs(self.tcfg.log_dir, exist_ok=True)
        # model_config.json sidecar lets eval rebuild the model from disk
        from ..eval.loading import save_model_config
        save_model_config(self.tcfg.log_dir, self.model.config)
        tree = {"params": self.state.params,
                "opt_state": self.state.opt_state,
                "step": self.state.step}
        meta = {"epoch": epoch, "step": int(self.state.step)}
        if metric is not None:
            meta["metric"] = float(metric)
        return save_checkpoint(self.tcfg.log_dir, name, tree, meta)


# ---------------------------------------------------------------------------
# Baseline trainer (parity: trainer/base.py:312-525)
# ---------------------------------------------------------------------------

class BaselineTrainer:
    """Trains the linear BaselineEncoder/BaselineDecoder models."""

    def __init__(
        self,
        model,
        train_dataloader: DataLoader,
        eval_dataloader: Optional[DataLoader],
        optimizer_config: OptimizerConfig,
        trainer_config: TrainerConfig,
        *,
        modal_filter: Dict[str, List[str]],
        mesh: Optional[jax.sharding.Mesh] = None,
        logger: Optional[MetricLogger] = None,
    ):
        self.model = model
        self.train_dataloader = train_dataloader
        self.eval_dataloader = eval_dataloader
        self.ocfg = optimizer_config
        self.tcfg = trainer_config
        self.modal_filter = modal_filter
        self.mesh = mesh
        self.logger = logger or MetricLogger(trainer_config.log_dir)
        self.metric = trainer_config.metric
        self.base_key = jax.random.PRNGKey(trainer_config.seed)

        total_steps = (trainer_config.num_epochs * len(train_dataloader)
                       // optimizer_config.gradient_accumulation_steps)
        self.tx, self.schedule = make_optimizer(optimizer_config,
                                                max(total_steps, 1))
        self.state = self._init_state()
        self._step = None
        self._eval_step = None

    def _data_dict(self, batch) -> Dict[str, jnp.ndarray]:
        """Route spikes/behavior into inputs/targets by modal_filter
        (reference ``trainer/base.py:337-346``)."""
        from ..parallel import shard_batch
        src = {"ap": "spikes_data", "behavior": "target"}
        return shard_batch({
            "inputs": batch[src[self.modal_filter["input"][0]]],
            "targets": batch[src[self.modal_filter["output"][0]]],
        }, self.mesh)

    def _init_state(self) -> TrainState:
        from ..parallel import shard_tree
        batch = next(iter(self.train_dataloader))
        variables = jax.jit(self.model.init)(
            self.base_key, self._data_dict(batch))
        state = TrainState.create(
            apply_fn=self.model.apply, params=variables["params"], tx=self.tx)
        return shard_tree(state, self.mesh)

    def _get_step(self):
        if self._step is None:
            @partial(jax.jit, donate_argnums=(0,))
            def step(state, data):
                def loss_fn(params):
                    out: BaselineOutput = state.apply_fn({"params": params}, data)
                    return out.loss
                loss, grads = jax.value_and_grad(loss_fn)(state.params)
                return state.apply_gradients(grads=grads), loss
            self._step = step
        return self._step

    def _get_eval_step(self):
        if self._eval_step is None:
            @jax.jit
            def step(params, data):
                out: BaselineOutput = self.model.apply({"params": params}, data)
                return out.loss, out.preds, out.targets
            self._eval_step = step
        return self._eval_step

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        self.train_dataloader.set_epoch(epoch)
        step = self._get_step()
        losses = []
        for batch in self.train_dataloader:
            self.state, loss = step(self.state, self._data_dict(batch))
            losses.append(loss)  # device-side; one host sync per epoch
        train_loss = float(jnp.stack(losses).sum()) if losses else 0.0
        return {"train_loss": train_loss,
                "train_loss_avg": train_loss / max(len(losses), 1)}

    def eval_epoch(self) -> Optional[Dict[str, Any]]:
        if self.eval_dataloader is None:
            return None
        step = self._get_eval_step()
        losses, gts, preds = [], [], []
        for batch in self.eval_dataloader:
            loss, p, t = step(self.state.params, self._data_dict(batch))
            n_real = int(batch.get("n_real", len(batch["spikes_data"])))
            losses.append(loss)
            gts.append((t, n_real))
            preds.append((p, n_real))
        eval_loss = float(jnp.stack(losses).sum()) if losses else 0.0
        gts = [np.asarray(a)[:n] for a, n in gts]
        preds = [np.asarray(a)[:n] for a, n in preds]
        gt = np.concatenate(gts, 0)
        pr = np.concatenate(preds, 0)
        out_mod = self.modal_filter["output"][0]
        if out_mod == "ap":
            pr = np.exp(pr)
            active = np.argsort(gt.sum((0, 1)))[::-1][:50].tolist()
            res = metrics_list(gt[:, :, active].transpose(2, 1, 0),
                               pr[:, :, active].transpose(2, 1, 0),
                               metrics=["r2"])
        else:
            res = metrics_list(gt, pr, metrics=[self.metric])
        return {"eval_loss": eval_loss,
                f"eval_trial_avg_{self.metric}": res[self.metric],
                "eval_gt": gt, "eval_preds": pr}

    # identical checkpoint layout ({params, opt_state, step} + meta
    # sidecar) -> the multimodal resume path applies verbatim
    restore = MultiModalTrainer.restore

    def train(self, start_epoch: int = 0) -> Dict[str, Any]:
        """``start_epoch`` > 0 resumes a restored run (``restore('last')``
        first); the best watermark is recovered from the model_best meta
        sidecar — 2000-epoch baseline runs survive interruption just like
        the multimodal trainer's (the reference has no resume at all)."""
        best_metric, best_epoch = -float("inf"), -1
        if start_epoch:
            from .checkpoint import load_checkpoint_meta
            meta = load_checkpoint_meta(self.tcfg.log_dir, "best") or {}
            if meta.get("metric") is not None:
                best_metric = float(meta["metric"])
                best_epoch = int(meta.get("epoch", -1))
        history = []
        for epoch in range(start_epoch, self.tcfg.num_epochs):
            train_res = self.train_epoch(epoch)
            eval_res = self.eval_epoch()
            row = {"epoch": epoch, "train_loss": train_res["train_loss"]}
            if eval_res:
                row["eval_loss"] = eval_res["eval_loss"]
                row[f"eval_trial_avg_{self.metric}"] = (
                    eval_res[f"eval_trial_avg_{self.metric}"])
                if "eval_per_session" in eval_res:
                    row["eval_per_session"] = eval_res["eval_per_session"]
                if eval_res[f"eval_trial_avg_{self.metric}"] > best_metric:
                    best_metric = eval_res[f"eval_trial_avg_{self.metric}"]
                    best_epoch = epoch
                    self.save_model("best", epoch=epoch, metric=best_metric)
                    if self.tcfg.save_plot_every_n_epochs:
                        self._plot_epoch(eval_res, epoch, prefix="best_")
            self.logger.log(row)
            history.append(row)
            if (self.tcfg.save_plot_every_n_epochs and eval_res
                    and epoch % self.tcfg.save_plot_every_n_epochs == 0):
                self._plot_epoch(eval_res, epoch)
            if (self.tcfg.save_every and epoch
                    and epoch % self.tcfg.save_every == 0):
                self.save_model("last", epoch=epoch)
        self.save_model("last", epoch=self.tcfg.num_epochs - 1)
        return {f"best_eval_trial_avg_{self.metric}": best_metric,
                "best_epoch": best_epoch, "history": history}

    def _plot_epoch(self, eval_res, epoch: int, prefix: str = "") -> None:
        """GT-vs-pred figures, disk + wandb (the reference BaselineTrainer
        plots identically to the multimodal one, ``trainer/base.py:
        354-418``)."""
        import matplotlib.pyplot as plt

        from ..utils.plotting import plot_gt_pred
        mod = self.modal_filter["output"][0]
        gt, preds = eval_res["eval_gt"], eval_res["eval_preds"]
        if gt is None or len(gt) == 0:
            return
        fig = plot_gt_pred(gt.mean(0).T, preds.mean(0).T,
                           epoch=epoch, modality=mod)
        fig.savefig(os.path.join(self.tcfg.log_dir,
                                 f"{prefix}gt_pred_fig_{mod}_{epoch}.png"))
        self.logger.log_figures(
            {f"{prefix}gt_pred_fig_{mod}": fig},
            extra={"best_epoch": epoch} if prefix else None)
        plt.close("all")

    def save_model(self, name="last", epoch=0, metric=None) -> str:
        os.makedirs(self.tcfg.log_dir, exist_ok=True)
        tree = {"params": self.state.params,
                "opt_state": self.state.opt_state,
                "step": self.state.step}
        meta = {"epoch": epoch, "step": int(self.state.step)}
        if metric is not None:
            meta["metric"] = float(metric)
        return save_checkpoint(self.tcfg.log_dir, name, tree, meta)


# ---------------------------------------------------------------------------
# factories (parity: trainer/make.py)
# ---------------------------------------------------------------------------

def make_multimodal_trainer(model, train_dataloader, eval_dataloader,
                            optimizer_config, trainer_config, **kwargs
                            ) -> MultiModalTrainer:
    return MultiModalTrainer(model, train_dataloader, eval_dataloader,
                             optimizer_config, trainer_config, **kwargs)


def make_baseline_trainer(model, train_dataloader, eval_dataloader,
                          optimizer_config, trainer_config, **kwargs
                          ) -> BaselineTrainer:
    return BaselineTrainer(model, train_dataloader, eval_dataloader,
                           optimizer_config, trainer_config, **kwargs)
