"""Eval-harness throughput benchmark (TPU): chunked-vmap co-smoothing.

The reference's per-neuron co-smoothing runs N sequential full-test-set
forwards (``/root/reference/src/utils/eval_utils.py:149-195``); this
framework sweeps all N heldout variants through chunked ``vmap`` (+
``lax.map`` over chunks, ``eval/harness.py``). This script measures the
actual TPU wall time of the N=668 sweep for several ``chunk`` sizes and
compares against the sequential estimate (one forward x N), producing the
RESULTS.md eval-time table (VERDICT.md "Next round" #7).

Run:  python scripts/bench_eval.py [--n-neurons 668] [--n-test 60]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from _common import *  # noqa: F401,F403 — path + platform setup
import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-neurons", type=int, default=668)
    ap.add_argument("--n-test", type=int, default=60)
    ap.add_argument("--max-F", type=int, default=100)
    ap.add_argument("--chunks", type=int, nargs="+", default=[4, 8, 16, 32])
    ap.add_argument("--use-mtm", action=argparse.BooleanOptionalAction, default=True)
    ap.add_argument("--out", type=str, default="results/bench_eval.json")
    args = ap.parse_args()

    import jax.numpy as jnp

    from multi_modal_foundation_model_tpu.data.loader import make_loader
    from multi_modal_foundation_model_tpu.data.session import synthetic_session
    from multi_modal_foundation_model_tpu.eval.harness import EvalForward
    from multi_modal_foundation_model_tpu.models.multimodal import (
        MultiModal, MultiModalConfig)
    from multi_modal_foundation_model_tpu.ops.masking import MaskParams

    N, T = args.n_neurons, args.max_F
    sess = synthetic_session(seed=0, n_trials=args.n_test, n_neurons=N,
                             n_timesteps=T)
    loader = make_loader(sess, batch_size=args.n_test, max_time_length=T,
                         max_space_length=N, shuffle=False)
    batch = next(iter(loader))

    cfg = MultiModalConfig(n_channels={"ap": N, "behavior": 2}, max_F=T,
                           mask_params=MaskParams(ratio=0.3),
                           compute_dtype=jnp.bfloat16, attn_impl="pallas",
                           remat_layers=False)
    model = MultiModal(cfg)
    k = jax.random.PRNGKey(0)

    # init via a tiny EvalForward call path (jitted init, tunnel-safe)
    from multi_modal_foundation_model_tpu.models.multimodal import \
        ModalityInput
    sp = jnp.asarray(batch["spikes_data"])
    be = jnp.asarray(batch["target"])
    attn = jnp.asarray(batch["time_attn_mask"])
    ts = jnp.asarray(batch["spikes_timestamps"])
    mi = {"ap": ModalityInput(sp, sp, attn, ts, jnp.ones_like(sp, jnp.int32)),
          "behavior": ModalityInput(be, be, attn, ts,
                                    jnp.zeros_like(be, jnp.int32))}
    params = jax.jit(lambda r, s, b: model.init(
        {"params": r}, {**mi, "ap": ModalityInput(s, s, attn, ts,
                                                  jnp.ones_like(s, jnp.int32)),
                        "behavior": ModalityInput(b, b, attn, ts,
                                                  jnp.zeros_like(b, jnp.int32))},
        training=False))(k, sp, be)["params"]

    # sequential estimate: one full-test-set forward, timed alone
    fwd1 = jax.jit(lambda p: model.apply({"params": p}, mi, training=False).loss)
    fwd1(params).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        loss = fwd1(params)
    loss.block_until_ready()
    t_fwd = (time.perf_counter() - t0) / 5
    seq_estimate = t_fwd * N

    visible = np.ones((N, N), dtype=np.float32)
    visible[np.arange(N), np.arange(N)] = 0.0
    targets = np.arange(N)

    results = {"n_neurons": N, "n_test": args.n_test,
               "single_forward_s": t_fwd,
               "sequential_estimate_s": seq_estimate, "chunks": {}}
    for chunk in args.chunks:
        fwd = EvalForward(model, params, batch, chunk=chunk)
        t0 = time.perf_counter()
        preds = fwd.sweep(visible, targets, args.use_mtm)
        np.asarray(preds)
        dt = time.perf_counter() - t0          # includes compile
        t0 = time.perf_counter()
        preds = fwd.sweep(visible, targets, args.use_mtm)
        np.asarray(preds)
        dt_warm = time.perf_counter() - t0
        results["chunks"][chunk] = {"first_call_s": dt, "warm_s": dt_warm,
                                    "speedup_vs_sequential":
                                        seq_estimate / dt_warm}
        print(f"chunk={chunk:3d}: warm {dt_warm:7.2f}s "
              f"(first {dt:7.2f}s incl. compile), "
              f"{seq_estimate/dt_warm:6.1f}x vs sequential estimate "
              f"({seq_estimate:.1f}s)")

    import os
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items() if k != "chunks"}))


if __name__ == "__main__":
    main()
