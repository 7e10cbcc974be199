"""Benchmark: pretrain sequences/sec/chip on the flagship workload.

Workload = the reference model/data shape (BASELINE.md): MultiModal 5+5
layers, H=256, 8 heads; T=100 bins x N=668 neurons per trial; full training
step (forward + backward + AdamW update) in bf16 with the Pallas
flash-attention path and the masker sampling live. Batch = 256 trials —
the production pretraining regime (the reference's batch-16 shape is
dispatch-latency-bound on a tunneled chip and swings +-40% run to run;
B=256 is compute-bound and reproducible. Both are reported in RESULTS.md).

``vs_baseline``: the reference publishes no throughput number. The
documented envelope is 2000 epochs over one session within an 8 h SLURM
walltime on 1 GPU (BASELINE.md "hardware envelope"); for the default
session (~450 train trials) that implies >=31 seq/s to finish in the
window — used here as the reference-throughput denominator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_SEQ_PER_SEC = 31.25  # 2000 epochs * 450 trials / 8 h (see docstring)


def main():
    import jax

    # hardware PRNG: threefry spends VPU cycles on the ~300M dropout/mask
    # draws per step (measured +18% step throughput from this switch)
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _flagship
    from multi_modal_foundation_model_tpu.models.multimodal import ModalityInput
    from multi_modal_foundation_model_tpu.train import (OptimizerConfig,
                                                        make_optimizer)
    from multi_modal_foundation_model_tpu.train.trainer import TrainState

    B, T, N = 256, 100, 668
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

    @jax.jit
    def train_step(state, spikes, behavior, key):
        k_mask, k_drop = jax.random.split(jax.random.fold_in(key, state.step))

        def loss_fn(p):
            out = model.apply({"params": p}, make_inputs(spikes, behavior),
                              training=True,
                              rngs={"mask": k_mask, "dropout": k_drop})
            return out.loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    # warmup (compile)
    for _ in range(3):
        state, loss = train_step(state, spikes, behavior, k)
    loss.block_until_ready()

    n_steps = 30
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, loss = train_step(state, spikes, behavior, k)
    loss.block_until_ready()
    dt = time.perf_counter() - t0

    seq_per_sec = B * n_steps / dt
    print(json.dumps({
        "metric": "pretrain_sequences_per_sec_per_chip",
        "value": round(seq_per_sec, 2),
        "unit": "seq/s/chip",
        "vs_baseline": round(seq_per_sec / BASELINE_SEQ_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
