"""Fused multi-head attention: Pallas TPU kernel + XLA reference path.

This is the framework's native-op tier, replacing the reference's single
"kernel-level" dependency — ``F.scaled_dot_product_attention`` in
``/root/reference/src/multi_modal/mm_utils.py:111,149`` — with a TPU-first
design:

- one fused Pallas kernel per (batch, head): QK^T + additive mask bias →
  softmax → (optional in-kernel probability dropout via the TPU PRNG) → PV,
  all resident in VMEM (sequences here are ≤256 tokens, so the whole
  attention state fits on-chip; no HBM roundtrip for the score matrix);
- a custom VJP whose backward pass is a second fused kernel that
  *recomputes* the softmax (cheaper than spilling probabilities to HBM at
  these sizes) and regenerates the identical dropout mask from the same
  per-(batch,head) PRNG seed;
- an ``impl="xla"`` path with identical math used as a fallback and as the
  oracle in kernel parity tests.

Masks are additive f32 biases (0 = attend, ``NEG_INF``-ish = don't). A large
*finite* negative is used instead of ``-inf`` so fully-masked rows (padded
trials/tokens) produce a uniform-attention row instead of NaNs; such rows
carry zero loss weight downstream.

Also hosts ``create_context_mask`` — the banded context-window matrix
(parity: ``mm_utils.py:17-28``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_LANE = 128


def create_context_mask(context_forward: int, context_backward: int,
                        max_F: int) -> jnp.ndarray:
    """(max_F, max_F) int mask: 1 iff token i may attend token j within the
    [i - backward, i + forward] window; -1 means unbounded on that side."""
    if context_forward == -1 and context_backward == -1:
        return jnp.ones((max_F, max_F), dtype=jnp.int32)
    fwd = context_forward if context_forward >= 0 else max_F
    back = context_backward if context_backward >= 0 else max_F
    i = jax.lax.broadcasted_iota(jnp.int32, (max_F, max_F), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (max_F, max_F), 1)
    mask = (j <= i + fwd)
    if back > 0:
        mask = mask & (j >= i - back)
    return mask.astype(jnp.int32)


def mask_to_bias(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """0/1 (or bool) attention mask -> additive bias (0 / NEG_INF)."""
    return jnp.where(mask.astype(bool), 0.0, NEG_INF).astype(dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _dropout_mask(shape, rate: float):
    """Regenerate the in-kernel dropout keep-mask (uint32 threshold test)."""
    bits = pltpu.prng_random_bits(shape)
    threshold = np.uint32(min(rate, 1.0) * np.float64(2**32 - 1))
    return bits > threshold


def _attn_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
                     *, scale: float, dropout_rate: float):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if dropout_rate > 0.0:
        # [0, 0]: SMEM loads must be scalar on TPU (a [0] slice is not)
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
        keep = _dropout_mask(p.shape, dropout_rate)
        p = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - dropout_rate))
    o = jnp.dot(p, v, preferred_element_type=jnp.float32) / l
    o_ref[0] = o.astype(o_ref.dtype)


def _attn_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, g_ref,
                     dq_ref, dk_ref, dv_ref,
                     *, scale: float, dropout_rate: float):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)

    # recompute normalized probabilities (and the identical dropout mask)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[0]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    pn = e / l                                    # softmax probs
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
        keep = _dropout_mask(pn.shape, dropout_rate)
        mscale = jnp.where(keep, 1.0 / (1.0 - dropout_rate), 0.0)
    else:
        mscale = None

    pd = pn * mscale if mscale is not None else pn  # dropped/scaled probs
    # dv = pd^T @ g
    dv = jax.lax.dot_general(pd, g, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # dpd = g @ v^T
    dpd = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dpn = dpd * mscale if mscale is not None else dpd
    # softmax backward: ds = pn * (dpn - rowsum(dpn * pn))
    ds = pn * (dpn - jnp.sum(dpn * pn, axis=-1, keepdims=True))
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _bh_specs(n_heads: int, tq: int, tk: int, d: int):
    """Block specs for (BH, T, D) operands + (B, Tq, Tk) head-shared bias."""
    return [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),  # seed
        pl.BlockSpec((1, tq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tq, tk), lambda i: (i // n_heads, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_mha(q, k, v, bias, seed, scale, dropout_rate, n_heads):
    """q/k/v: (B*H, T, D) padded; bias: (B, Tq, Tk) f32; seed: (1,1) int32."""
    BH, Tq, D = q.shape
    Tk = k.shape[1]
    kernel = functools.partial(_attn_fwd_kernel, scale=scale,
                               dropout_rate=dropout_rate)
    return pl.pallas_call(
        kernel,
        grid=(BH,),
        in_specs=_bh_specs(n_heads, Tq, Tk, D),
        out_specs=pl.BlockSpec((1, Tq, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Tq, D), q.dtype),
        interpret=_should_interpret(),
    )(seed, q, k, v, bias)


def _flash_mha_fwd(q, k, v, bias, seed, scale, dropout_rate, n_heads):
    out = _flash_mha(q, k, v, bias, seed, scale, dropout_rate, n_heads)
    return out, (q, k, v, bias, seed)


def _flash_mha_bwd(scale, dropout_rate, n_heads, res, g):
    q, k, v, bias, seed = res
    BH, Tq, D = q.shape
    Tk = k.shape[1]
    kernel = functools.partial(_attn_bwd_kernel, scale=scale,
                               dropout_rate=dropout_rate)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(BH,),
        in_specs=_bh_specs(n_heads, Tq, Tk, D) + [
            pl.BlockSpec((1, Tq, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Tq, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tk, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tq, D), q.dtype),
            jax.ShapeDtypeStruct((BH, Tk, D), k.dtype),
            jax.ShapeDtypeStruct((BH, Tk, D), v.dtype),
        ],
        interpret=_should_interpret(),
    )(seed, q, k, v, bias, g)
    zero_bias = np.zeros(bias.shape, dtype=jax.dtypes.float0) \
        if not jnp.issubdtype(bias.dtype, jnp.floating) else jnp.zeros_like(bias)
    zero_seed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, zero_bias, zero_seed


_flash_mha.defvjp(_flash_mha_fwd, _flash_mha_bwd)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _xla_attention(q, k, v, bias, dropout_rate, dropout_key):
    """Reference-math path: (B, H, Tq, D) heads-first operands."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    s = s + bias[:, None, :, :]
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout_rate, p.shape)
        p = jnp.where(keep, p, 0.0) / (1.0 - dropout_rate)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)


def multi_head_attention(
    q: jnp.ndarray,                    # (B, Tq, hidden)
    k: jnp.ndarray,                    # (B, Tk, hidden)
    v: jnp.ndarray,                    # (B, Tk, hidden)
    n_heads: int,
    mask: Optional[jnp.ndarray] = None,    # (B, Tq, Tk) 1=attend
    bias: Optional[jnp.ndarray] = None,    # additive, overrides mask
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    impl: str = "pallas",
) -> jnp.ndarray:
    """Fused MHA over already-projected q/k/v; returns (B, Tq, hidden).

    ``impl="pallas"`` pads sequence lengths up to lane multiples, runs the
    fused kernel per (batch, head), and slices back; ``impl="xla"`` is the
    plain-einsum oracle. Both use f32 accumulation regardless of input dtype.
    """
    B, Tq, hidden = q.shape
    Tk = k.shape[1]
    assert hidden % n_heads == 0, "hidden size not divisible by n_heads"
    D = hidden // n_heads
    scale = 1.0 / np.sqrt(D)

    if bias is None:
        if mask is None:
            bias = jnp.zeros((B, Tq, Tk), jnp.float32)
        else:
            bias = mask_to_bias(mask)
    bias = bias.astype(jnp.float32)

    if dropout_rate > 0.0 and dropout_key is None:
        raise ValueError("dropout_rate > 0 requires dropout_key")

    def split_heads(x, T):
        return x.reshape(B, T, n_heads, D).transpose(0, 2, 1, 3)

    qh, kh, vh = split_heads(q, Tq), split_heads(k, Tk), split_heads(v, Tk)

    if impl == "xla":
        out = _xla_attention(qh, kh, vh, bias, dropout_rate, dropout_key)
        return out.transpose(0, 2, 1, 3).reshape(B, Tq, hidden)

    # ---- pallas path: pad sequence dims to lane multiples ----
    Tq_p, Tk_p = _round_up(Tq, _LANE), _round_up(Tk, _LANE)

    def pad_T(x, T_p):
        T = x.shape[2]
        if T_p == T:
            return x
        return jnp.pad(x, ((0, 0), (0, 0), (0, T_p - T), (0, 0)))

    qh, kh, vh = pad_T(qh, Tq_p), pad_T(kh, Tk_p), pad_T(vh, Tk_p)
    bias_p = jnp.pad(bias, ((0, 0), (0, Tq_p - Tq), (0, Tk_p - Tk)),
                     constant_values=NEG_INF)

    if dropout_rate > 0.0:
        seed = jax.random.randint(dropout_key, (1, 1), 0, np.int32(2**31 - 1),
                                  dtype=jnp.int32)
    else:
        seed = jnp.zeros((1, 1), jnp.int32)

    qf = qh.reshape(B * n_heads, Tq_p, D)
    kf = kh.reshape(B * n_heads, Tk_p, D)
    vf = vh.reshape(B * n_heads, Tk_p, D)
    out = _flash_mha(qf, kf, vf, bias_p, seed, scale, float(dropout_rate),
                     n_heads)
    out = out.reshape(B, n_heads, Tq_p, D)[:, :, :Tq, :]
    return out.transpose(0, 2, 1, 3).reshape(B, Tq, hidden)
