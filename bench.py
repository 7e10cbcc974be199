"""Benchmark: pretrain throughput + MFU on the flagship workload.

Workload = the reference model/data shape (BASELINE.md): MultiModal 5+5
layers, H=256, 8 heads; T=100 bins x N=668 neurons per trial; full training
step (forward + backward + AdamW update) in bf16 with the Pallas
flash-attention path and the masker sampling live.

Reported in ONE JSON line (driver contract: metric/value/unit/vs_baseline;
extra keys carry the secondary measurements):

- ``value``: sequences/sec/chip at batch 256 — the production pretraining
  regime (compute-bound, reproducible).
- ``mfu``: model-FLOPs-utilization of that step — XLA cost-analysis FLOPs
  of the *compiled* train step divided by (step time x chip bf16 peak).
- ``b16_seq_per_sec`` / ``b16_cv`` / ``b16_pass_drift``: the
  reference-shape batch-16 number, measured as a SINGLE dispatch of
  ``lax.scan`` over 50 training steps so the tunneled backend's per-call
  dispatch latency (which made per-step timing swing +-40%, RESULTS.md)
  cancels out; two 8-repeat passes separated by the other benchmark
  workloads capture the minute-scale tunnel drift a single burst misses
  (``b16_pass_drift`` = relative spread between the pass means).

``vs_baseline``: the reference publishes no throughput number. The
documented envelope is 2000 epochs over one session within an 8 h SLURM
walltime on 1 GPU (BASELINE.md "hardware envelope"); for the default
session (~450 train trials) that implies >=31 seq/s to finish in the
window — used here as the reference-throughput denominator.
"""

import json
import sys
import time

import numpy as np

BASELINE_SEQ_PER_SEC = 31.25  # 2000 epochs * 450 trials / 8 h (see docstring)


def _build(B, T, N):
    import jax
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


class LargeBatchBench:
    """Production-batch (B=256) seq/s + MFU. Like ReferenceBatchBench,
    measured in TWO passes separated in time: the tunnel's server phase
    shifts whole-process absolutes by up to ~10% on minute timescales
    (RESULTS.md round 3), so a single burst cannot bound what a re-run may
    legitimately differ by — the pass drift can."""

    def __init__(self, B=256, T=100, N=668, n_steps=30):
        import jax

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
        for _ in range(3):
            state, loss = self._jitted(state, *self._args, self._k)
        loss.block_until_ready()
        self._state = state
        self._passes = []

    def measure_pass(self):
        t0 = time.perf_counter()
        for _ in range(self.n_steps):
            self._state, loss = self._jitted(self._state, *self._args,
                                             self._k)
        loss.block_until_ready()
        self._passes.append(time.perf_counter() - t0)

    def report(self):
        from multi_modal_foundation_model_tpu.utils.profiling import \
            MFUTracker
        per_pass = [self.B * self.n_steps / dt for dt in self._passes]
        seq = float(np.mean(per_pass))
        drift = (max(per_pass) - min(per_pass)) / np.mean(per_pass)
        step_s = self.B / seq
        mfu = MFUTracker(self.flops).mfu(step_s) if self.flops else None
        return seq, mfu, self.flops, float(drift)


class ReferenceBatchBench:
    """Reference-shape (B=16) throughput via one lax.scan dispatch per
    measurement: per-call tunnel dispatch latency amortizes over
    ``scan_len`` steps, de-noising the number (VERDICT.md r1 Weak #4).

    Round-2 follow-up (VERDICT r2 Weak #4): successive *processes* drifted
    ~6% while each reported CV <4% — tunnel/server state shifts on minute
    timescales, so a single burst understates the true variance. The bench
    therefore takes TWO measurement passes separated in time (before and
    after the other benchmark workloads run) and reports the combined
    mean/CV plus the pass-to-pass drift, which bounds what a re-run may
    legitimately differ by."""

    def __init__(self, B=16, T=100, N=668, scan_len=50, repeats=8):
        import jax
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
        last.block_until_ready()
        self._times = []

    def measure_pass(self):
        marks = []
        for _ in range(self.repeats):
            t0 = time.perf_counter()
            self._state, last = self._run(self._state, self._key)
            last.block_until_ready()
            marks.append(time.perf_counter() - t0)
        self._times.append(np.array(marks))
        return self.B * self.scan_len / np.mean(marks)

    def report(self):
        all_t = np.concatenate(self._times)
        seq = self.B * self.scan_len / all_t.mean()
        cv = float(all_t.std() / all_t.mean())
        per_pass = [self.B * self.scan_len / t.mean() for t in self._times]
        drift = (max(per_pass) - min(per_pass)) / np.mean(per_pass)
        return seq, cv, float(drift)


def bench_in_loop(B=256, T=100, N=668, n_trials=512, epochs=2):
    """TRUE training-loop throughput: loader + device-resident data path +
    jitted steps (the fixed-batch numbers above exclude the data pipeline;
    with per-batch host->device copies this collapses ~10x through a
    tunneled backend — RESULTS.md 'device-resident data path')."""
    from multi_modal_foundation_model_tpu.data.loader import make_loader
    from multi_modal_foundation_model_tpu.data.session import synthetic_splits
    from multi_modal_foundation_model_tpu.train import (MultiModalTrainer,
                                                        TrainerConfig,
                                                        OptimizerConfig)
    from __graft_entry__ import _flagship
    import tempfile

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


def main():
    import jax

    # hardware PRNG: threefry spends VPU cycles on the ~300M dropout/mask
    # draws per step (measured +18% step throughput from this switch)
    jax.config.update("jax_default_prng_impl", "rbg")

    b16 = ReferenceBatchBench()
    b16.measure_pass()                 # pass 1 (fresh process)
    b256 = LargeBatchBench()
    b256.measure_pass()                # pass 1
    try:
        in_loop = bench_in_loop()
    except Exception:      # secondary measurement; never fail the bench —
        import traceback   # but make the regression visible on stderr
        print("bench_in_loop failed (reported as null):", file=sys.stderr)
        traceback.print_exc()
        in_loop = None
    b16.measure_pass()                 # pass 2 (minutes later)
    b256.measure_pass()                # pass 2
    b16_seq, b16_cv, b16_drift = b16.report()
    seq_per_sec, mfu, flops, b256_drift = b256.report()

    print(json.dumps({
        "metric": "pretrain_sequences_per_sec_per_chip",
        "value": round(seq_per_sec, 2),
        "unit": "seq/s/chip",
        "vs_baseline": round(seq_per_sec / BASELINE_SEQ_PER_SEC, 2),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "b256_pass_drift": round(b256_drift, 4),
        "step_flops": flops,
        "b16_seq_per_sec": round(b16_seq, 2),
        "b16_cv": round(b16_cv, 4),
        "b16_pass_drift": round(b16_drift, 4),
        "in_loop_seq_per_sec":
            round(in_loop, 2) if in_loop is not None else None,
    }))


if __name__ == "__main__":
    main()
