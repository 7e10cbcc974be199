"""Attention kernel experiments, round 3b: bf16 MXU dots in the stacked
kernels.

The integrated kernels (head-stacked fwd, scratch-assembled bwd,
``ops/attention.py``) cast q/k/v/g from bf16 to f32 before every dot.
On the MXU an f32 matmul runs as multiple bf16 passes (~3-4x the cost),
while a bf16-input / f32-accumulate dot is EXACT for the score dots
(bf16 x bf16 products are representable in f32) — the only lossy step is
casting the f32 softmax outputs (p, ds) back to bf16 for the second-stage
dots. Round 2 tried bf16 inside the old per-head-loop kernels and it
regressed (RESULTS.md); this retests under the stacked structure where
the VPU share is smaller.

Run: python scripts/bench_attn_variants4.py [--dropout 0.4]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench_attn_variants2 import _bias, _drop_mask, _in_specs
from bench_attn_variants3 import (b_scratch, build_bwd, build_fwd, f_scratch,
                                  f_stack)


def f_bf16(seed_ref, q_ref, k_ref, v_ref, pad_ref, static_ref, o_ref,
           *, scale, dropout_rate, n_heads, d_head):
    """f_stack with bf16 dot inputs: scores = dot(q*scale, k) in bf16/f32acc,
    p cast to bf16 for the p@v dots."""
    GB, Tq, _ = q_ref.shape
    Tk = k_ref.shape[1]
    q = (q_ref[...].astype(jnp.float32) * scale).astype(jnp.bfloat16)
    k = k_ref[...].astype(jnp.bfloat16)
    v = v_ref[...].astype(jnp.bfloat16)
    bias = _bias(pad_ref, static_ref, GB, Tq, Tk)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    ss = []
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        ss.append(jax.lax.dot_general(q[..., sl], k[..., sl],
                                      (((2,), (2,)), ((0,), (0,))),
                                      preferred_element_type=jnp.float32))
    s = jnp.concatenate(ss, axis=1)
    s = s + jnp.tile(bias, (1, n_heads, 1))
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        keep = _drop_mask(p.shape, dropout_rate)
        p = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - dropout_rate))
    pb = p.astype(jnp.bfloat16)
    outs = []
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        rows = slice(h * Tq, (h + 1) * Tq)
        o = jax.lax.dot_general(pb[:, rows], v[..., sl],
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) \
            / l[:, rows]
        outs.append(o)
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def b_bf16(seed_ref, q_ref, k_ref, v_ref, pad_ref, static_ref, g_ref,
           dq_ref, dk_ref, dv_ref, s_ref, d_ref, *,
           scale, dropout_rate, n_heads, d_head):
    """b_scratch with bf16 dot inputs; ds/pd cast to bf16 for the output
    dots (the one lossy step, ~0.4% relative on the already-noisy grads)."""
    GB, Tq, _ = q_ref.shape
    Tk = k_ref.shape[1]
    q = (q_ref[...].astype(jnp.float32) * scale).astype(jnp.bfloat16)
    k = k_ref[...].astype(jnp.bfloat16)
    v = v_ref[...].astype(jnp.bfloat16)
    g = g_ref[...].astype(jnp.bfloat16)
    bias = _bias(pad_ref, static_ref, GB, Tq, Tk)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        rows = slice(h * Tq, (h + 1) * Tq)
        s_ref[:, rows] = jax.lax.dot_general(
            q[..., sl], k[..., sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) + bias
        d_ref[:, rows] = jax.lax.dot_general(
            g[..., sl], v[..., sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    s = s_ref[...]
    dpd = d_ref[...]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    pn = e * pl.reciprocal(l, approx=False)
    if dropout_rate > 0.0:
        keep = _drop_mask(pn.shape, dropout_rate)
        mscale = jnp.where(keep, 1.0 / (1.0 - dropout_rate), 0.0)
        pd = pn * mscale
        dpn = dpd * mscale
    else:
        pd, dpn = pn, dpd
    ds = pn * (dpn - jnp.sum(dpn * pn, axis=-1, keepdims=True))
    dsb = ds.astype(jnp.bfloat16)
    pdb = pd.astype(jnp.bfloat16)
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        rows = slice(h * Tq, (h + 1) * Tq)
        dsh = dsb[:, rows]
        dq_ref[..., sl] = (jax.lax.dot_general(
            dsh, k[..., sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        ).astype(dq_ref.dtype)
        dk_ref[..., sl] = jax.lax.dot_general(
            dsh, q[..., sl], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)
        dv_ref[..., sl] = jax.lax.dot_general(
            pdb[:, rows], g[..., sl], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)


def _marginal(chain, q, n1, n2, reps):
    f1, f2 = chain(n1), chain(n2)
    f1(q).block_until_ready()
    f2(q).block_until_ready()
    t1 = t2 = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        f1(q).block_until_ready()
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        f2(q).block_until_ready()
        t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / (n2 - n1), t1, t2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dropout", type=float, default=0.0)
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--T", type=int, default=200)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    B, Tq, Tk, hidden, n_heads = args.B, args.T, args.T, 256, 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Tq, hidden)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Tk, hidden)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Tk, hidden)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, Tq, hidden)), jnp.float32)
    pad = jnp.asarray(rng.integers(0, 2, size=(B, 1, Tk)), jnp.int32)
    pad = pad.at[:, :, :4].set(1)
    static = jnp.asarray(np.eye(Tq, Tk, dtype=np.int32)[None])
    seed = jnp.zeros((1, 1), jnp.int32)
    dr = args.dropout

    ref = None
    for name, kern, gb, sc in (("f_stack  ", f_stack, 1, False),
                               ("f_bf16   ", f_bf16, 1, False),
                               ("f_bf16   ", f_bf16, 2, False),
                               ("f_bf16sc ", None, 2, True)):
        if kern is None:
            continue  # placeholder slot
        try:
            call = build_fwd(kern, B, Tq, Tk, hidden, n_heads, gb, dr,
                             scratch=sc)
            out = jax.jit(lambda c=call: c(seed, q, k, v, pad, static))()
            if dr == 0.0:
                if ref is None:
                    ref = out
                err = float(jnp.max(jnp.abs(out - ref)))
            else:
                err = float(jnp.max(jnp.abs(out)))

            def chain(n, c=call):
                @jax.jit
                def f(x):
                    for _ in range(n):
                        x = c(seed, x, k, v, pad, static)
                    return f if False else x
                return f
            dt, t1, t2 = _marginal(chain, q, 4, 24, args.reps)
            print(f"{name} gb={gb} dr={dr}  {dt*1e3:6.3f} ms "
                  f"[t4={t1*1e3:.1f} t24={t2*1e3:.1f}] err={err:.1e}",
                  flush=True)
        except Exception as e:
            print(f"{name} gb={gb} FAILED {type(e).__name__}: "
                  f"{str(e)[:90]}", flush=True)

    bref = None
    for name, kern, gb in (("b_scratch", b_scratch, 1),
                           ("b_bf16   ", b_bf16, 1),
                           ("b_bf16   ", b_bf16, 2)):
        try:
            call = build_bwd(kern, B, Tq, Tk, hidden, n_heads, gb, dr,
                             scratch=True)
            outs = jax.jit(
                lambda c=call: c(seed, q, k, v, pad, static, g))()
            if dr == 0.0:
                if bref is None:
                    bref = outs
                err = max(float(jnp.max(jnp.abs(o - r)))
                          for o, r in zip(outs, bref))
            else:
                err = max(float(jnp.max(jnp.abs(o))) for o in outs)

            def chain(n, c=call):
                @jax.jit
                def f(x):
                    for _ in range(n):
                        dq, dk2, dv2 = c(seed, x, k, v, pad, static, g)
                        x = dq + 0.001 * (dk2 + dv2)
                    return x
                return f
            dt, t1, t2 = _marginal(chain, q, 3, 13, args.reps)
            print(f"{name} gb={gb} dr={dr}  {dt*1e3:6.3f} ms "
                  f"[t3={t1*1e3:.1f} t13={t2*1e3:.1f}] err={err:.1e}",
                  flush=True)
        except Exception as e:
            print(f"{name} gb={gb} FAILED {type(e).__name__}: "
                  f"{str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
