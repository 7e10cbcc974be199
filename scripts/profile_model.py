"""Profile the flagship training step: step time, seq/s, MFU, xprof trace.

Observability entry point (new vs the reference, which has no profiler —
SURVEY.md §5). Writes a TensorBoard-compatible trace with --trace_dir.
"""

import argparse
import json

from _common import add_common_args, warn_unsupported  # noqa: F401

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--n_neurons", type=int, default=668)
    ap.add_argument("--n_steps", type=int, default=30)
    ap.add_argument("--trace_dir", type=str, default=None)
    args = ap.parse_args()
    warn_unsupported(args, 'dp', 'tp', 'device_resident')

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch, _flagship
    from multi_modal_foundation_model_tpu.models.multimodal import ModalityInput
    from multi_modal_foundation_model_tpu.train import (OptimizerConfig,
                                                        make_optimizer)
    from multi_modal_foundation_model_tpu.train.trainer import TrainState
    from multi_modal_foundation_model_tpu.utils import (MFUTracker, StepTimer,
                                                        trace_context)
    from multi_modal_foundation_model_tpu.utils.profiling import chip_peak_flops

    B, T, N = args.batch_size, 100, args.n_neurons
    model = _flagship(n_neurons=N, max_F=T)
    rng = np.random.default_rng(0)
    spikes, behavior, attn, ts = _example_batch(rng, B, T, N)
    spikes, behavior = jnp.asarray(spikes), jnp.asarray(behavior)
    attn, ts = jnp.asarray(attn), jnp.asarray(ts)

    def make_inputs(s, b):
        return {"ap": ModalityInput(inputs=s, targets=s, attn_mask=attn,
                                    timestamps=ts, eval_mask=None),
                "behavior": ModalityInput(inputs=b, targets=b, attn_mask=attn,
                                          timestamps=ts, eval_mask=None)}

    k = jax.random.PRNGKey(0)
    params = jax.jit(lambda r, s, b: model.init(
        r, make_inputs(s, b), training=True))(
        {"params": k, "mask": k, "dropout": k}, spikes, behavior)["params"]
    tx, _ = make_optimizer(OptimizerConfig(), total_steps=10_000)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    def train_step(state, s, b, key):
        k_mask, k_drop = jax.random.split(jax.random.fold_in(key, state.step))

        def loss_fn(p):
            out = model.apply({"params": p}, make_inputs(s, b), training=True,
                              rngs={"mask": k_mask, "dropout": k_drop})
            return out.loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    lowered = jax.jit(train_step).lower(state, spikes, behavior, k)
    compiled = lowered.compile()
    mfu = MFUTracker(compiled)

    timer = StepTimer(warmup=3)
    loss = None

    def run(n):
        nonlocal state, loss
        for _ in range(n):
            with timer:
                state, loss = compiled(state, spikes, behavior, k)
                loss.block_until_ready()

    run(3 + args.n_steps)
    if args.trace_dir:
        with trace_context(args.trace_dir):
            run(3)

    step_s = timer.mean_step_s
    print(json.dumps({
        "step_time_ms": round(step_s * 1e3, 3),
        "seq_per_sec": round(B / step_s, 1),
        "flops_per_step": mfu.flops_per_step,
        "chip_peak_flops": chip_peak_flops(),
        "mfu": round(mfu.mfu(step_s), 4),
        "loss": float(loss),
    }))


if __name__ == "__main__":
    main()
