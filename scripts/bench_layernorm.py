"""LayerNorm kernel A/B: production step + isolated-backward microbench.

Reproduces the round-4 measurements that set ``PALLAS_LAYERNORM = "off"``
(ops/layernorm.py). Two parts:

1. ``--production``: the flagship B=256 train step with the norm backend
   flipped between "off" / "bwd" / "full" — same process, interleaved
   min-of-passes (measurement hygiene per RESULTS.md round 3).
   Measured 2026-08-19: off 69.9 ms, bwd 74.0 ms, full 75.6 ms.

2. ``--isolated``: the LN backward alone at the trunk-norm shape
   (51200 tokens x H=256, bf16), chained-scan marginal cost.
   Measured: Pallas 117.5 us (~670 GB/s) vs XLA VJP 211.3 us (~372 GB/s).

Together they pin the conclusion: the kernel is 1.8x faster in isolation
but loses in situ because a custom call materializes dy/dx at all 27
norm sites where XLA fuses the LN backward into its neighbors.

Usage: python scripts/bench_layernorm.py [--production] [--isolated]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")
# same cache policy as scripts/_common.py: MMFM_COMPILE_CACHE= disables
_cache_dir = os.environ.get("MMFM_COMPILE_CACHE",
                            os.path.expanduser("~/.cache/mmfm_jax"))
if _cache_dir:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import multi_modal_foundation_model_tpu.ops.layernorm as lnmod


def _sync(x):
    return float(np.asarray(x))


def production(n_steps=20, reps=4):
    from bench import _build

    def build(mode):
        lnmod.PALLAS_LAYERNORM = mode
        state, train_step, spikes, behavior = _build(256, 100, 668)
        k = jax.random.PRNGKey(0)
        jitted = jax.jit(train_step, donate_argnums=(0,))
        for _ in range(3):
            state, loss = jitted(state, spikes, behavior, k)
        _sync(loss)
        return [jitted, state, spikes, behavior, k]

    modes = ("off", "bwd", "full")
    runs = {m: build(m) for m in modes}
    times = {m: [] for m in modes}
    for _ in range(reps):
        for m in modes:
            jitted, state, spikes, behavior, k = runs[m]
            t0 = time.perf_counter()
            for _ in range(n_steps):
                state, loss = jitted(state, spikes, behavior, k)
            _sync(loss)
            times[m].append((time.perf_counter() - t0) / n_steps * 1e3)
            runs[m][1] = state
    for m in modes:
        print(f"LN-{m:4s}: min {min(times[m]):6.2f} ms/step  "
              f"all {[f'{x:.2f}' for x in times[m]]}")


def _marginal_us(make_body, x0, n_lo=8, n_hi=40, reps=5):
    def run(n):
        @jax.jit
        def f(x):
            def body(x, i):
                return make_body(x, i), ()
            x, _ = jax.lax.scan(body, x, jnp.arange(n))
            return jnp.sum(x[:1, :1].astype(jnp.float32))
        return f
    f_lo, f_hi = run(n_lo), run(n_hi)
    _sync(f_lo(x0)); _sync(f_hi(x0))
    lo = hi = np.inf
    for _ in range(reps):
        t0 = time.perf_counter(); _sync(f_lo(x0))
        lo = min(lo, time.perf_counter() - t0)
        t0 = time.perf_counter(); _sync(f_hi(x0))
        hi = min(hi, time.perf_counter() - t0)
    return (hi - lo) / (n_hi - n_lo) * 1e6


def isolated(M=51200, H=256):
    dt = jnp.bfloat16
    scale = jax.random.normal(jax.random.PRNGKey(1), (H,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (H,)) * 0.1
    x0 = jax.random.normal(jax.random.PRNGKey(0), (M, H),
                           jnp.float32).astype(dt)
    bytes_bwd = 3 * M * H * 2   # read x + read dy + write dx

    def body_pallas(x, i):
        g = jnp.roll(x, 1, axis=0)   # data-dependent chain, no CSE
        dx, _, _ = lnmod._pallas_ln_bwd(1e-5, dt, (x, scale), g)
        return dx + x

    def body_xla(x, i):
        g = jnp.roll(x, 1, axis=0)
        _, vjp = jax.vjp(
            lambda xx: lnmod._xla_layernorm(xx, scale, bias, 1e-5, dt), x)
        (dx,) = vjp(g)
        return dx + x

    for name, body in (("pallas_bwd", body_pallas),
                       ("xla_vjp_bwd", body_xla)):
        us = _marginal_us(body, x0)
        gbps = bytes_bwd / (us * 1e-6) / 1e9
        print(f"{name:12s}: {us:8.1f} us/call  ~{gbps:6.0f} GB/s "
              f"(3-array traffic model)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--production", action="store_true")
    ap.add_argument("--isolated", action="store_true")
    args = ap.parse_args()
    if not (args.production or args.isolated):
        args.isolated = True
    if args.isolated:
        isolated()
    if args.production:
        production()
