"""Attention kernel experiments, round 3: scratch-buffer score assembly.

The per-head score dots write (+bias) directly into one VMEM scratch
buffer shaped (GB, H*Tq, Tk) — no concat copy, no bias tile — then ONE
softmax (+ dropout draw) runs over the stacked buffer and per-head p@v
slices it back out. Same for bwd (two scratch buffers: scores + dP).

Run: python scripts/bench_attn_variants3.py [--dropout 0.4]
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

from bench_attn_variants2 import (b_loop, b_stack, f_loop, f_stack,
                                  _bias, _drop_mask, _in_specs)


def f_scratch(seed_ref, q_ref, k_ref, v_ref, pad_ref, static_ref, o_ref,
              s_ref, *, scale, dropout_rate, n_heads, d_head):
    GB, Tq, _ = q_ref.shape
    Tk = k_ref.shape[1]
    q = q_ref[...].astype(jnp.float32) * scale
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    bias = _bias(pad_ref, static_ref, GB, Tq, Tk)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        rows = slice(h * Tq, (h + 1) * Tq)
        s_ref[:, rows] = jax.lax.dot_general(
            q[..., sl], k[..., sl], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) + bias
    s = s_ref[...]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        keep = _drop_mask(p.shape, dropout_rate)
        p = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - dropout_rate))
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        rows = slice(h * Tq, (h + 1) * Tq)
        o_ref[..., sl] = (jax.lax.dot_general(
            p[:, rows], v[..., sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) / l[:, rows]
        ).astype(o_ref.dtype)


def b_scratch(seed_ref, q_ref, k_ref, v_ref, pad_ref, static_ref, g_ref,
              dq_ref, dk_ref, dv_ref, s_ref, d_ref, *,
              scale, dropout_rate, n_heads, d_head):
    GB, Tq, _ = q_ref.shape
    Tk = k_ref.shape[1]
    q = q_ref[...].astype(jnp.float32) * scale
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
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
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        rows = slice(h * Tq, (h + 1) * Tq)
        dsh = ds[:, rows]
        dq_ref[..., sl] = (jax.lax.dot_general(
            dsh, k[..., sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        ).astype(dq_ref.dtype)
        dk_ref[..., sl] = jax.lax.dot_general(
            dsh, q[..., sl], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)
        dv_ref[..., sl] = jax.lax.dot_general(
            pd[:, rows], g[..., sl], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)


def build_fwd(kernel, B, Tq, Tk, hidden, n_heads, gb, dropout_rate,
              scratch=False):
    d_head = hidden // n_heads
    scale = 1.0 / np.sqrt(d_head)
    kfn = functools.partial(kernel, scale=scale, dropout_rate=dropout_rate,
                            n_heads=n_heads, d_head=d_head)
    kw = {}
    if scratch:
        kw["scratch_shapes"] = [
            pltpu.VMEM((gb, n_heads * Tq, Tk), jnp.float32)]

    def call(seed, q, k, v, pad, static):
        return pl.pallas_call(
            kfn, grid=(B // gb,), in_specs=_in_specs(gb, Tq, Tk, hidden),
            out_specs=pl.BlockSpec((gb, Tq, hidden), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Tq, hidden), q.dtype),
            **kw,
        )(seed, q, k, v, pad, static)

    return call


def build_bwd(kernel, B, Tq, Tk, hidden, n_heads, gb, dropout_rate,
              scratch=False):
    d_head = hidden // n_heads
    scale = 1.0 / np.sqrt(d_head)
    kfn = functools.partial(kernel, scale=scale, dropout_rate=dropout_rate,
                            n_heads=n_heads, d_head=d_head)
    blk_q = pl.BlockSpec((gb, Tq, hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_k = pl.BlockSpec((gb, Tk, hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    kw = {}
    if scratch:
        kw["scratch_shapes"] = [
            pltpu.VMEM((gb, n_heads * Tq, Tk), jnp.float32),
            pltpu.VMEM((gb, n_heads * Tq, Tk), jnp.float32)]

    def call(seed, q, k, v, pad, static, g):
        return pl.pallas_call(
            kfn, grid=(B // gb,),
            in_specs=_in_specs(gb, Tq, Tk, hidden) + [blk_q],
            out_specs=[blk_q, blk_k, blk_k],
            out_shape=[jax.ShapeDtypeStruct((B, Tq, hidden), q.dtype),
                       jax.ShapeDtypeStruct((B, Tk, hidden), q.dtype),
                       jax.ShapeDtypeStruct((B, Tk, hidden), q.dtype)],
            **kw,
        )(seed, q, k, v, pad, static, g)

    return call


def _marginal(chain, q, n1, n2, reps):
    f1, f2 = chain(n1), chain(n2)
    f1(q).block_until_ready()
    f2(q).block_until_ready()
    t1 = t2 = np.inf
    for _ in range(reps):   # interleave to decorrelate tunnel drift
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
    for name, kern, gb, sc in (("f_loop", f_loop, 4, False),
                               ("f_stack", f_stack, 2, False),
                               ("f_scratch", f_scratch, 2, True),
                               ("f_scratch", f_scratch, 4, True)):
        try:
            call = build_fwd(kern, B, Tq, Tk, hidden, n_heads, gb, dr,
                             scratch=sc)
            out = jax.jit(lambda c=call: c(seed, q, k, v, pad, static))()
            if dr == 0.0:
                if ref is None:
                    ref = out
                err = float(jnp.max(jnp.abs(out - ref)))
            else:
                err = float(jnp.max(jnp.abs(out)))  # sanity: finite
            def chain(n, c=call):
                @jax.jit
                def f(x):
                    for _ in range(n):
                        x = c(seed, x, k, v, pad, static)
                    return x
                return f
            dt, t1, t2 = _marginal(chain, q, 4, 24, args.reps)
            print(f"{name:10s} gb={gb} dr={dr} {dt*1e3:7.3f} ms "
                  f"[t4={t1*1e3:.1f} t24={t2*1e3:.1f}] err={err:.1e}",
                  flush=True)
        except Exception as e:
            print(f"{name:10s} gb={gb} FAILED {type(e).__name__}: "
                  f"{str(e)[:90]}", flush=True)

    refs = None
    for name, kern, gb, sc in (("b_loop", b_loop, 2, False),
                               ("b_stack", b_stack, 1, False),
                               ("b_scratch", b_scratch, 1, True),
                               ("b_scratch", b_scratch, 2, True)):
        try:
            call = build_bwd(kern, B, Tq, Tk, hidden, n_heads, gb, dr,
                             scratch=sc)
            outs = jax.jit(
                lambda c=call: c(seed, q, k, v, pad, static, g))()
            if dr == 0.0:
                if refs is None:
                    refs = outs
                err = max(float(jnp.max(jnp.abs(a - b)))
                          for a, b in zip(outs, refs))
            else:
                err = max(float(jnp.max(jnp.abs(a))) for a in outs)
            def chain(n, c=call):
                @jax.jit
                def f(x):
                    for _ in range(n):
                        dq, dk, dv = c(seed, x, k, v, pad, static, g)
                        x = dq
                    return x
                return f
            dt, t1, t2 = _marginal(chain, q, 3, 13, args.reps)
            print(f"{name:10s} gb={gb} dr={dr} {dt*1e3:7.3f} ms "
                  f"[t3={t1*1e3:.1f} t13={t2*1e3:.1f}] err={err:.1e}",
                  flush=True)
        except Exception as e:
            print(f"{name:10s} gb={gb} FAILED {type(e).__name__}: "
                  f"{str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
