"""Attention kernel experiments, round 2: stacked-softmax refinements +
backward-kernel restructure. See bench_attn_variants.py for method.

Fwd variants:
  f_loop   — production per-head loop
  f_stack  — per-head dots -> sublane concat -> ONE softmax (winner r1)
  f_stack4 — f_stack with 4D-broadcast bias (no materialized tile)
Bwd variants:
  b_loop   — production per-head loop
  b_stack  — s/dpd stacked along sublanes, batched softmax/ds math,
             per-head dq/dk/dv dots

Run: python scripts/bench_attn_variants2.py [--dropout 0.4] [--gb N]
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

NEG_INF = -1e30


def _bias(pad_ref, static_ref, GB, Tq, Tk):
    attend = static_ref[0] > 0
    attend = jnp.broadcast_to(attend[None], (GB, Tq, Tk))
    attend = attend | (pad_ref[:, 0, :] > 0)[:, None, :]
    return jnp.where(attend, 0.0, NEG_INF).astype(jnp.float32)


def _drop_mask(shape, rate):
    bits = pltpu.prng_random_bits(shape)
    threshold = np.uint32(min(rate, 1.0) * np.float64(2**32 - 1))
    return bits > threshold


# ----------------------------------------------------------------- fwd

def f_loop(seed_ref, q_ref, k_ref, v_ref, pad_ref, static_ref, o_ref, *,
           scale, dropout_rate, n_heads, d_head):
    GB, Tq, _ = q_ref.shape
    Tk = k_ref.shape[1]
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    bias = _bias(pad_ref, static_ref, GB, Tq, Tk)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    outs = []
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        s = jax.lax.dot_general(q[..., sl], k[..., sl],
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        if dropout_rate > 0.0:
            keep = _drop_mask(p.shape, dropout_rate)
            p = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - dropout_rate))
        o = jax.lax.dot_general(p, v[..., sl], (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) / l
        outs.append(o)
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def f_stack(seed_ref, q_ref, k_ref, v_ref, pad_ref, static_ref, o_ref, *,
            scale, dropout_rate, n_heads, d_head):
    GB, Tq, _ = q_ref.shape
    Tk = k_ref.shape[1]
    q = q_ref[...].astype(jnp.float32) * scale
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    bias = _bias(pad_ref, static_ref, GB, Tq, Tk)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    ss = []
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        ss.append(jax.lax.dot_general(q[..., sl], k[..., sl],
                                      (((2,), (2,)), ((0,), (0,))),
                                      preferred_element_type=jnp.float32))
    s = jnp.concatenate(ss, axis=1)                 # (GB, H*Tq, Tk)
    s = s + jnp.tile(bias, (1, n_heads, 1))
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        keep = _drop_mask(p.shape, dropout_rate)
        p = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - dropout_rate))
    outs = []
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        rows = slice(h * Tq, (h + 1) * Tq)
        o = jax.lax.dot_general(p[:, rows], v[..., sl],
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) \
            / l[:, rows]
        outs.append(o)
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def f_stack4(seed_ref, q_ref, k_ref, v_ref, pad_ref, static_ref, o_ref, *,
             scale, dropout_rate, n_heads, d_head):
    GB, Tq, _ = q_ref.shape
    Tk = k_ref.shape[1]
    q = q_ref[...].astype(jnp.float32) * scale
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    bias = _bias(pad_ref, static_ref, GB, Tq, Tk)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    ss = []
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        ss.append(jax.lax.dot_general(q[..., sl], k[..., sl],
                                      (((2,), (2,)), ((0,), (0,))),
                                      preferred_element_type=jnp.float32))
    s = jnp.concatenate(ss, axis=1).reshape(GB, n_heads, Tq, Tk)
    s = s + bias[:, None]                            # broadcast, no tile
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        keep = _drop_mask(p.shape, dropout_rate)
        p = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - dropout_rate))
    p = p.reshape(GB, n_heads * Tq, Tk)
    l = l.reshape(GB, n_heads * Tq, 1)
    outs = []
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        rows = slice(h * Tq, (h + 1) * Tq)
        o = jax.lax.dot_general(p[:, rows], v[..., sl],
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) \
            / l[:, rows]
        outs.append(o)
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


# ----------------------------------------------------------------- bwd

def b_loop(seed_ref, q_ref, k_ref, v_ref, pad_ref, static_ref, g_ref,
           dq_ref, dk_ref, dv_ref, *, scale, dropout_rate, n_heads, d_head):
    GB, Tq, _ = q_ref.shape
    Tk = k_ref.shape[1]
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    bias = _bias(pad_ref, static_ref, GB, Tq, Tk)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    dqs, dks, dvs = [], [], []
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        qh, kh, vh, gh = q[..., sl], k[..., sl], v[..., sl], g[..., sl]
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        s = s + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=-1, keepdims=True)
        pn = e / l
        if dropout_rate > 0.0:
            keep = _drop_mask(pn.shape, dropout_rate)
            mscale = jnp.where(keep, 1.0 / (1.0 - dropout_rate), 0.0)
            pd = pn * mscale
        else:
            mscale, pd = None, pn
        dv = jax.lax.dot_general(pd, gh, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dpd = jax.lax.dot_general(gh, vh, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        dpn = dpd * mscale if mscale is not None else dpd
        ds = pn * (dpn - jnp.sum(dpn * pn, axis=-1, keepdims=True))
        dq = jax.lax.dot_general(ds, kh, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(ds, qh, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)
    dq_ref[...] = jnp.concatenate(dqs, axis=-1).astype(dq_ref.dtype)
    dk_ref[...] = jnp.concatenate(dks, axis=-1).astype(dk_ref.dtype)
    dv_ref[...] = jnp.concatenate(dvs, axis=-1).astype(dv_ref.dtype)


def b_stack(seed_ref, q_ref, k_ref, v_ref, pad_ref, static_ref, g_ref,
            dq_ref, dk_ref, dv_ref, *, scale, dropout_rate, n_heads, d_head):
    GB, Tq, _ = q_ref.shape
    Tk = k_ref.shape[1]
    q = q_ref[...].astype(jnp.float32) * scale
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    bias = _bias(pad_ref, static_ref, GB, Tq, Tk)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    ss, dps = [], []
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        ss.append(jax.lax.dot_general(q[..., sl], k[..., sl],
                                      (((2,), (2,)), ((0,), (0,))),
                                      preferred_element_type=jnp.float32))
        dps.append(jax.lax.dot_general(g[..., sl], v[..., sl],
                                       (((2,), (2,)), ((0,), (0,))),
                                       preferred_element_type=jnp.float32))
    s = jnp.concatenate(ss, axis=1)                  # (GB, H*Tq, Tk)
    dpd = jnp.concatenate(dps, axis=1)
    s = s + jnp.tile(bias, (1, n_heads, 1))
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
    dqs, dks, dvs = [], [], []
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        rows = slice(h * Tq, (h + 1) * Tq)
        dsh = ds[:, rows]
        dq = jax.lax.dot_general(dsh, k[..., sl],
                                 (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * scale
        dk = jax.lax.dot_general(dsh, q[..., sl],
                                 (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dv = jax.lax.dot_general(pd[:, rows], g[..., sl],
                                 (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)
    dq_ref[...] = jnp.concatenate(dqs, axis=-1).astype(dq_ref.dtype)
    dk_ref[...] = jnp.concatenate(dks, axis=-1).astype(dk_ref.dtype)
    dv_ref[...] = jnp.concatenate(dvs, axis=-1).astype(dv_ref.dtype)


# ------------------------------------------------------------- harness

def build_fwd(kernel, B, Tq, Tk, hidden, n_heads, gb, dropout_rate):
    d_head = hidden // n_heads
    scale = 1.0 / np.sqrt(d_head)
    kfn = functools.partial(kernel, scale=scale, dropout_rate=dropout_rate,
                            n_heads=n_heads, d_head=d_head)
    specs = _in_specs(gb, Tq, Tk, hidden)

    def call(seed, q, k, v, pad, static):
        return pl.pallas_call(
            kfn, grid=(B // gb,), in_specs=specs,
            out_specs=pl.BlockSpec((gb, Tq, hidden), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Tq, hidden), q.dtype),
        )(seed, q, k, v, pad, static)

    return call


def build_bwd(kernel, B, Tq, Tk, hidden, n_heads, gb, dropout_rate):
    d_head = hidden // n_heads
    scale = 1.0 / np.sqrt(d_head)
    kfn = functools.partial(kernel, scale=scale, dropout_rate=dropout_rate,
                            n_heads=n_heads, d_head=d_head)
    blk_q = pl.BlockSpec((gb, Tq, hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_k = pl.BlockSpec((gb, Tk, hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    specs = _in_specs(gb, Tq, Tk, hidden) + [blk_q]

    def call(seed, q, k, v, pad, static, g):
        return pl.pallas_call(
            kfn, grid=(B // gb,), in_specs=specs,
            out_specs=[blk_q, blk_k, blk_k],
            out_shape=[jax.ShapeDtypeStruct((B, Tq, hidden), q.dtype),
                       jax.ShapeDtypeStruct((B, Tk, hidden), q.dtype),
                       jax.ShapeDtypeStruct((B, Tk, hidden), q.dtype)],
        )(seed, q, k, v, pad, static, g)

    return call


def _in_specs(gb, tq, tk, hidden):
    return [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((gb, tq, hidden), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, tk, hidden), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, tk, hidden), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, 1, tk), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tq, tk), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def time_chain_fwd(call, seed, q, k, v, pad, static, n1=4, n2=20, reps=3):
    def chain(n):
        @jax.jit
        def f(q):
            x = q
            for _ in range(n):
                x = call(seed, x, k, v, pad, static)
            return x
        return f
    return _marginal(chain, q, n1, n2, reps)


def time_chain_bwd(call, seed, q, k, v, pad, static, g, n1=3, n2=12, reps=3):
    def chain(n):
        @jax.jit
        def f(q):
            x = q
            for _ in range(n):
                dq, dk, dv = call(seed, x, k, v, pad, static, g)
                x = dq
            return x
        return f
    return _marginal(chain, q, n1, n2, reps)


def _marginal(chain, q, n1, n2, reps):
    f1, f2 = chain(n1), chain(n2)
    f1(q).block_until_ready()
    f2(q).block_until_ready()
    ts = []
    for f in (f1, f2):
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            f(q).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dropout", type=float, default=0.0)
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--T", type=int, default=200)
    ap.add_argument("--skip-fwd", action="store_true")
    ap.add_argument("--skip-bwd", action="store_true")
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

    if not args.skip_fwd:
        ref = None
        for name, kern, gbs in (("f_loop", f_loop, (4,)),
                                ("f_stack", f_stack, (1, 2, 4)),
                                ("f_stack4", f_stack4, (2,))):
            for gb in gbs:
                try:
                    call = build_fwd(kern, B, Tq, Tk, hidden, n_heads, gb, dr)
                    out = jax.jit(
                        lambda c=call: c(seed, q, k, v, pad, static))()
                    if dr == 0.0:
                        if ref is None:
                            ref = out
                        err = float(jnp.max(jnp.abs(out - ref)))
                    else:
                        err = float("nan")
                    dt = time_chain_fwd(call, seed, q, k, v, pad, static)
                    print(f"{name:9s} gb={gb} dr={dr} {dt*1e3:7.3f} ms  "
                          f"err={err:.1e}", flush=True)
                except Exception as e:
                    print(f"{name:9s} gb={gb} FAILED "
                          f"{type(e).__name__}: {str(e)[:90]}", flush=True)

    if not args.skip_bwd:
        refs = None
        for name, kern, gbs in (("b_loop", b_loop, (2,)),
                                ("b_stack", b_stack, (1, 2))):
            for gb in gbs:
                try:
                    call = build_bwd(kern, B, Tq, Tk, hidden, n_heads, gb, dr)
                    outs = jax.jit(
                        lambda c=call: c(seed, q, k, v, pad, static, g))()
                    if dr == 0.0:
                        if refs is None:
                            refs = outs
                        err = max(float(jnp.max(jnp.abs(a - b)))
                                  for a, b in zip(outs, refs))
                    else:
                        err = float("nan")
                    dt = time_chain_bwd(call, seed, q, k, v, pad, static, g)
                    print(f"{name:9s} gb={gb} dr={dr} {dt*1e3:7.3f} ms  "
                          f"err={err:.1e}", flush=True)
                except Exception as e:
                    print(f"{name:9s} gb={gb} FAILED "
                          f"{type(e).__name__}: {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
