"""Attention-kernel restructure experiments (round 3, VERDICT item 1).

Measures candidate restructurings of the fused MHA forward kernel's
per-head lane-slice loop (`ops/attention.py:_attn_fwd_kernel`) on the real
chip. Timing = marginal cost of chained calls inside ONE jit (per-call
tunnel dispatch otherwise swamps sub-ms kernels — RESULTS.md).

Variants:
  v1_loop        — production kernel structure (per-head loop, bias add)
  v2_qscale      — v1 + scale folded into q (kills one score-shaped mult)
  v3_stack       — per-head score dots concat'd along sublanes ->
                   ONE (GB, H*Tq, Tk) softmax; per-head p@v
  v4_batched     — 4D dot_general (batch dims (GB, H)) for scores,
                   single softmax, per-head p@v
  v5_maskmul     — v2 + unmasked-max stability + 0/1 mask MULTIPLY fused
                   after exp instead of the NEG_INF bias ADD before max

Run:  python scripts/bench_attn_variants.py [--dropout 0.4]
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


# ---------------------------------------------------------------- kernels

def _bias(pad_ref, static_ref, GB, Tq, Tk):
    attend = static_ref[0] > 0
    attend = jnp.broadcast_to(attend[None], (GB, Tq, Tk))
    attend = attend | (pad_ref[:, 0, :] > 0)[:, None, :]
    return jnp.where(attend, 0.0, NEG_INF).astype(jnp.float32)


def _maskf(pad_ref, static_ref, GB, Tq, Tk):
    attend = static_ref[0] > 0
    attend = jnp.broadcast_to(attend[None], (GB, Tq, Tk))
    attend = attend | (pad_ref[:, 0, :] > 0)[:, None, :]
    return attend.astype(jnp.float32)


def _drop_mask(shape, rate):
    bits = pltpu.prng_random_bits(shape)
    threshold = np.uint32(min(rate, 1.0) * np.float64(2**32 - 1))
    return bits > threshold


def k_v1_loop(seed_ref, q_ref, k_ref, v_ref, pad_ref, static_ref, o_ref, *,
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


def k_v2_qscale(seed_ref, q_ref, k_ref, v_ref, pad_ref, static_ref, o_ref, *,
                scale, dropout_rate, n_heads, d_head):
    GB, Tq, _ = q_ref.shape
    Tk = k_ref.shape[1]
    q = q_ref[...].astype(jnp.float32) * scale     # fold scale into q once
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
                                preferred_element_type=jnp.float32)
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


def k_v3_stack(seed_ref, q_ref, k_ref, v_ref, pad_ref, static_ref, o_ref, *,
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


def k_v4_batched(seed_ref, q_ref, k_ref, v_ref, pad_ref, static_ref, o_ref, *,
                 scale, dropout_rate, n_heads, d_head):
    GB, Tq, _ = q_ref.shape
    Tk = k_ref.shape[1]
    q = q_ref[...].astype(jnp.float32) * scale
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    bias = _bias(pad_ref, static_ref, GB, Tq, Tk)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    qr = q.reshape(GB, Tq, n_heads, d_head)
    kr = k.reshape(GB, Tk, n_heads, d_head)
    # (GB, H, Tq, Tk)
    s = jax.lax.dot_general(qr, kr, (((3,), (3,)), ((0, 2), (0, 2))),
                            preferred_element_type=jnp.float32)
    s = s + bias[:, None]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        keep = _drop_mask(p.shape, dropout_rate)
        p = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - dropout_rate))
    outs = []
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        o = jax.lax.dot_general(p[:, h], v[..., sl],
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) / l[:, h]
        outs.append(o)
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def k_v5_maskmul(seed_ref, q_ref, k_ref, v_ref, pad_ref, static_ref, o_ref, *,
                 scale, dropout_rate, n_heads, d_head):
    GB, Tq, _ = q_ref.shape
    Tk = k_ref.shape[1]
    q = q_ref[...].astype(jnp.float32) * scale
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    maskf = _maskf(pad_ref, static_ref, GB, Tq, Tk)  # 0/1 float
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    outs = []
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        s = jax.lax.dot_general(q[..., sl], k[..., sl],
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        # unmasked max is a valid stability shift (upper bound); masked
        # entries are killed by the multiply after exp
        m = jnp.max(s, axis=-1, keepdims=True)
        if dropout_rate > 0.0:
            keep = _drop_mask(s.shape, dropout_rate)
            w = maskf * jnp.where(keep, 1.0 / (1.0 - dropout_rate), 0.0)
        else:
            w = maskf
        p = jnp.exp(s - m) * w
        # NOTE: l must come from the UNdropped masked probabilities to
        # match softmax-then-dropout semantics
        l = jnp.sum(jnp.exp(s - m) * maskf, axis=-1, keepdims=True)
        l = jnp.maximum(l, 1e-30)  # fully-masked rows -> 0/eps = 0
        o = jax.lax.dot_general(p, v[..., sl], (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) / l
        outs.append(o)
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


VARIANTS = {
    "v1_loop": k_v1_loop,
    "v2_qscale": k_v2_qscale,
    "v3_stack": k_v3_stack,
    "v4_batched": k_v4_batched,
    "v5_maskmul": k_v5_maskmul,
}


# ------------------------------------------------------------- harness

def build_call(kernel, B, Tq, Tk, hidden, n_heads, gb, dropout_rate):
    d_head = hidden // n_heads
    scale = 1.0 / np.sqrt(d_head)
    kfn = functools.partial(kernel, scale=scale, dropout_rate=dropout_rate,
                            n_heads=n_heads, d_head=d_head)
    specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((gb, Tq, hidden), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, Tk, hidden), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, Tk, hidden), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((gb, 1, Tk), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, Tq, Tk), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]

    def call(seed, q, k, v, pad, static):
        return pl.pallas_call(
            kfn,
            grid=(B // gb,),
            in_specs=specs,
            out_specs=pl.BlockSpec((gb, Tq, hidden), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Tq, hidden), q.dtype),
        )(seed, q, k, v, pad, static)

    return call


def time_chain(call, seed, q, k, v, pad, static, n1=4, n2=20, reps=3):
    """Marginal per-call time from two chain lengths inside one jit."""

    def chain(n):
        @jax.jit
        def f(q):
            x = q
            for _ in range(n):
                x = call(seed, x, k, v, pad, static)
            return x
        return f

    f1, f2 = chain(n1), chain(n2)
    f1(q).block_until_ready()
    f2(q).block_until_ready()
    ts = []
    for f, n in ((f1, n1), (f2, n2)):
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
    ap.add_argument("--gb", type=int, default=0, help="0 = auto per variant")
    args = ap.parse_args()

    B, Tq, Tk, hidden, n_heads = args.B, args.T, args.T, 256, 8
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, Tq, hidden)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, Tk, hidden)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, Tk, hidden)), jnp.float32)
    pad = jnp.asarray(rng.integers(0, 2, size=(B, 1, Tk)), jnp.int32)
    pad = pad.at[:, :, :4].set(1)   # no fully-masked rows
    static = jnp.asarray(np.eye(Tq, Tk, dtype=np.int32)[None])
    seed = jnp.zeros((1, 1), jnp.int32)

    # correctness reference (v1 structure, numpy-free via jnp on device)
    ref_call = build_call(k_v1_loop, B, Tq, Tk, hidden, n_heads,
                          gb=4, dropout_rate=0.0)
    ref = jax.jit(lambda: ref_call(seed, q, k, v, pad, static))()
    ref.block_until_ready()

    gbs = {"v1_loop": 4, "v2_qscale": 4, "v3_stack": 2, "v4_batched": 2,
           "v5_maskmul": 4}
    for name, kern in VARIANTS.items():
        gb = args.gb or gbs[name]
        try:
            call = build_call(kern, B, Tq, Tk, hidden, n_heads, gb,
                              args.dropout)
            if args.dropout == 0.0:
                out = jax.jit(
                    lambda c=call: c(seed, q, k, v, pad, static))()
                err = float(jnp.max(jnp.abs(out - ref)))
            else:
                err = float("nan")
            dt = time_chain(call, seed, q, k, v, pad, static)
            print(f"{name:12s} gb={gb:2d} {dt*1e3:7.3f} ms/call  "
                  f"max|err|={err:.2e}", flush=True)
        except Exception as e:
            msg = str(e).splitlines()[0][:120]
            print(f"{name:12s} gb={gb:2d} FAILED: {type(e).__name__}: {msg}",
                  flush=True)


if __name__ == "__main__":
    main()
