"""Fused multi-head attention: Pallas TPU kernel + XLA reference path.

This is the framework's native-op tier, replacing the reference's single
"kernel-level" dependency — ``F.scaled_dot_product_attention`` in
``/root/reference/src/multi_modal/mm_utils.py:111,149`` — with a TPU-first
design shaped by hardware profiling:

- **Natural layout in, natural layout out.** The kernel consumes q/k/v as
  ``(B, T, H*D)`` exactly as the projections produce them and splits heads
  *inside* the kernel via static lane slices. The conventional
  ``(B, H, T, D)`` head transpose materializes D=32-minor tensors that
  waste 4x HBM on every touch (lane padding to 128) — measured as the
  dominant cost of the einsum path at production batch sizes.
- **Masks as (key_pad, static) decompositions, biased in-kernel.** Every
  mask this model uses — encoder ``eye OR pad`` (``mm.py:152-158``),
  decoder pad / causal / modality-separation (``mm.py:178-194``) — is
  ``attend(b,q,k) = static(q,k) OR key_pad(b,k)``. The kernel rebuilds the
  additive bias from a ``(B,1,Tk)`` int vector and a shared ``(Tq,Tk)``
  matrix, eliminating the (B,T,T) f32 bias tensors (41 MB per call at
  B=256) entirely.
- **Blocked grid.** Each grid step processes a block of batches (all heads)
  sized to VMEM; a per-(batch,head) grid serializes B*H tiny matmuls
  through the scalar core (measured ~100x off peak).
- **In-kernel probability dropout** via the TPU PRNG; the custom VJP
  *recomputes* the softmax in backward (cheaper than spilling (B,H,T,T)
  probabilities to HBM, which triggers XLA's compressed-spill pathology)
  and regenerates the identical dropout mask from the same per-step seed
  and draw order.
- ``impl="xla"`` — plain-einsum oracle with identical math, used as the
  parity reference in tests and as the fallback for arbitrary full masks.

A large *finite* negative (NEG_INF) is used instead of ``-inf`` so
fully-masked rows (padded trials) produce uniform attention instead of
NaNs; such rows carry zero loss weight downstream.

Also hosts ``create_context_mask`` — the banded context-window matrix
(parity: ``mm_utils.py:17-28``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# backward kernel uses the forward's saved softmax row stats (LSE); False
# recomputes them in-kernel (kept only for A/B benchmarking)
_BWD_USE_SAVED_LSE = True

# True: sidecar stores m (row 0) and log(l) (row 1) separately — exact on
# fully-masked rows but one extra stat relayout per kernel (measured
# +1.9 ms/step vs recompute). False (default): single clamped-fold row
# ``max(m, _LSE_FLOOR) + log(l)`` — fast path; fully-masked rows get
# pn = 0, i.e. ZERO gradient through them (see _attn_fwd_kernel).
_LSE_SPLIT = False
_LSE_FLOOR = -1e6

# True: softmax in base 2 — log2(e) folds into the q pre-scale so the score
# stack's exponential pass is a bare exp2 (VPU exp lowers to exp2 + a
# per-element multiply; folding kills that multiply). Math is identical:
# exp2(x*log2e) == exp(x). The LSE sidecar is then base-2 (log2(l)); the
# backward consumes it consistently and its trailing dk scale carries the
# same fold. A/B flag, flipped between compiles (static at trace time).
# Measured OFF (scripts/bench_attn_base2.py): fwd+bwd −2.0 %/−3.6 % slower
# with the flag on at dropout 0/0.4 — Mosaic already folds exp's log2e
# multiply into the adjacent elementwise chain, so the "saved" multiply
# was never paid and the reassociated arithmetic perturbs scheduling.
_SOFTMAX_BASE2 = False
_LOG2E = float(np.log2(np.e))


class MaskSpec(NamedTuple):
    """attend(b, q, k) = static(q, k) OR key_pad(b, k).

    ``key_pad``: (B, Tk) or (B, 1, Tk) int, 1 = key attendable (None = none
    attendable through this term). ``static``: (Tq, Tk) bool/int shared
    across the batch (None = all-False). Covers every mask in the model:
    encoder ``eye | pad``, decoder pad-only, causal (static only),
    modality-separation ``pad | sep``.
    """

    key_pad: Optional[jnp.ndarray] = None
    static: Optional[jnp.ndarray] = None


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


def spec_to_bias(spec: MaskSpec, B: int, Tq: int, Tk: int) -> jnp.ndarray:
    """(B, Tq, Tk) additive bias from a MaskSpec (oracle/xla path)."""
    attend = jnp.zeros((B, Tq, Tk), bool)
    if spec.static is not None:
        attend = attend | spec.static.astype(bool)[None]
    if spec.key_pad is not None:
        pad = spec.key_pad.reshape(B, Tk)
        attend = attend | (pad.astype(bool))[:, None, :]
    return mask_to_bias(attend)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _dropout_mask(shape, rate: float):
    """In-kernel dropout keep-mask (uint32 threshold test)."""
    bits = pltpu.prng_random_bits(shape)
    threshold = np.uint32(min(rate, 1.0) * np.float64(2**32 - 1))
    return bits > threshold


def _kernel_bias(pad_ref, static_ref, GB: int, Tq: int, Tk: int):
    """Rebuild the additive bias block from (GB,1,Tk) pad + (1,Tq,Tk) static."""
    attend = static_ref[0] > 0                            # (Tq, Tk)
    attend = jnp.broadcast_to(attend[None], (GB, Tq, Tk))
    attend = attend | (pad_ref[:, 0, :] > 0)[:, None, :]
    return jnp.where(attend, 0.0, NEG_INF).astype(jnp.float32)


def _attn_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, pad_ref, static_ref,
                     o_ref, ml_ref=None, *, scale: float,
                     dropout_rate: float, n_heads: int, d_head: int):
    """Head-stacked forward (round-3 restructure, measured −10-16%/call):
    per-head score dots are concatenated along sublanes into ONE
    (GB, H*Tq, Tk) array so the softmax (max/exp/sum), bias add and
    dropout draw each run once over all heads instead of 8× in a Python
    loop; the scale folds into q (kills a score-shaped multiply). The
    per-head p@v dots then slice tile-aligned row blocks back out.

    When differentiated (``ml_ref`` present — the VJP forward only; the
    primal/eval forward skips the output entirely), the softmax row
    stats are written to a small (GB, 8, H*Tq) f32 sidecar (~13 MB at
    B=256; the 8-row axis satisfies Mosaic's 8-sublane block tiling) so
    the backward recovers probabilities in one exp pass — skipping its
    max-reduce, sum-reduce AND normalize passes over the score stack
    (flash-attention LSE residual, measured −1.55 ms/step). Default
    layout: ONE row holding ``max(m, _LSE_FLOOR) + log(l)``. The clamp
    exists because a raw ``m + log(l)`` is absorbed to ``m`` in f32 on
    fully-masked rows (m = NEG_INF, ulp ~1e23 swallows log(Tk)), which
    would silently turn their uniform 1/Tk backward probabilities into
    1 — a Tk-fold gradient error. With the clamp those rows instead get
    ``exp(s - lse) = exp(NEG_INF - _LSE_FLOOR) = 0``: fully-masked rows
    contribute ZERO gradient (their forward stays uniform and their
    loss weight is zero in this model anyway; zero is the safe contract
    for any other caller — no gradient flows into padded positions).
    ``_LSE_SPLIT`` stores m and log(l) in separate rows instead —
    exact 1/Tk backward on fully-masked rows, but the extra stat's
    lane->sublane relayout measured +1.9 ms/step; kept for A/B."""
    GB, Tq, _ = q_ref.shape
    Tk = k_ref.shape[1]
    exp, log = (jnp.exp2, jnp.log2) if _SOFTMAX_BASE2 else (jnp.exp, jnp.log)
    q = q_ref[...].astype(jnp.float32) * (
        scale * _LOG2E if _SOFTMAX_BASE2 else scale)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    bias = _kernel_bias(pad_ref, static_ref, GB, Tq, Tk)
    if dropout_rate > 0.0:
        # seed once per grid step; ONE stacked draw follows — the backward
        # kernel replays the identical (GB, H*Tq, Tk) draw (fwd/bwd grids
        # tile the batch axis identically when dropout is on)
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    ss = []
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        ss.append(jax.lax.dot_general(q[..., sl], k[..., sl],
                                      (((2,), (2,)), ((0,), (0,))),
                                      preferred_element_type=jnp.float32))
    s = jnp.concatenate(ss, axis=1)                    # (GB, H*Tq, Tk)
    s = s + jnp.tile(bias, (1, n_heads, 1))
    m = jnp.max(s, axis=-1, keepdims=True)
    p = exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if ml_ref is not None:
        if _LSE_SPLIT:
            ml_ref[:, 0, :] = m[..., 0]
            ml_ref[:, 1, :] = log(l)[..., 0]
            ml_ref[:, 2:, :] = jnp.zeros_like(ml_ref[:, 2:, :])
        else:
            lse = jnp.maximum(m, _LSE_FLOOR) + log(l)
            ml_ref[:, 0, :] = lse[..., 0]
            ml_ref[:, 1:, :] = jnp.zeros_like(ml_ref[:, 1:, :])
    if dropout_rate > 0.0:
        keep = _dropout_mask(p.shape, dropout_rate)
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


def _attn_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, pad_ref, static_ref,
                     g_ref, ml_ref, dq_ref, dk_ref, dv_ref,
                     s_ref, d_ref, *, scale: float, dropout_rate: float,
                     n_heads: int, d_head: int, dots_dtype=jnp.float32,
                     use_saved_lse: bool = True):
    """Head-stacked backward with VMEM scratch assembly (measured −29%/
    call): the s and dP=g@vᵀ dots write straight into two (GB, H*Tq, Tk)
    scratch buffers (no concat copies), the softmax recompute + ds math
    runs once over the stack, and per-head dq/dk/dv dots slice it back.

    ``dots_dtype=bf16`` on hardware: TPU DEFAULT-precision f32 dots
    already truncate operands to bf16 in the MXU, so explicit bf16
    operands are bit-identical (measured err 0.0) while halving the
    VMEM operand reads of all five dot classes — measured −10%/call
    within-process. Interpret mode keeps f32 (CPU dots are true f32;
    the cast would *lose* precision vs the oracle there)."""
    GB, Tq, _ = q_ref.shape
    Tk = k_ref.shape[1]
    # base-2 mode: q carries scale*log2e so the recomputed score stack
    # lives in the same base-2 domain as the forward's saved sidecar and
    # pn recovery is a bare exp2 (see _SOFTMAX_BASE2)
    exp = jnp.exp2 if _SOFTMAX_BASE2 else jnp.exp
    q_scale = scale * _LOG2E if _SOFTMAX_BASE2 else scale
    q = (q_ref[...].astype(jnp.float32) * q_scale).astype(dots_dtype)
    k = k_ref[...].astype(dots_dtype)
    v = v_ref[...].astype(dots_dtype)
    g = g_ref[...].astype(dots_dtype)
    bias = _kernel_bias(pad_ref, static_ref, GB, Tq, Tk)
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
    if use_saved_lse:
        # one exp pass recovers the probabilities from the forward's
        # saved row stats — skips the max-reduce, sum-reduce and
        # normalize passes over the (GB, H*Tq, Tk) stack (measured
        # −1.55 ms/step). See _attn_fwd_kernel: the default clamped
        # fold makes fully-masked rows come back as pn = 0 (zero grad).
        if _LSE_SPLIT:
            pn = exp((s - ml_ref[:, 0, :][..., None])
                     - ml_ref[:, 1, :][..., None])
        else:
            pn = exp(s - ml_ref[:, 0, :][..., None])
    else:                     # recompute (kept for A/B benchmarking)
        m = jnp.max(s, axis=-1, keepdims=True)
        l = jnp.sum(exp(s - m), axis=-1, keepdims=True)
        pn = exp(s - m) * pl.reciprocal(l, approx=False)
    if dropout_rate > 0.0:
        keep = _dropout_mask(pn.shape, dropout_rate)
        mscale = jnp.where(keep, 1.0 / (1.0 - dropout_rate), 0.0)
        pd = pn * mscale
        dpn = dpd * mscale
    else:
        pd, dpn = pn, dpd
    ds = (pn * (dpn - jnp.sum(dpn * pn, axis=-1, keepdims=True))
          ).astype(dots_dtype)
    pd = pd.astype(dots_dtype)
    for h in range(n_heads):
        sl = slice(h * d_head, (h + 1) * d_head)
        rows = slice(h * Tq, (h + 1) * Tq)
        dsh = ds[:, rows]
        # ds is the gradient wrt the RAW (base-e, pre-q_scale) scores —
        # pn/dpn are probabilities, base-independent. dq = ds @ k * scale;
        # dk = ds @ (q_orig*scale) — but q carries q_scale = scale*log2e
        # in base-2 mode, so dk divides the fold back out (ln2 = 1/log2e).
        dq_ref[..., sl] = (jax.lax.dot_general(
            dsh, k[..., sl], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        ).astype(dq_ref.dtype)
        dkh = jax.lax.dot_general(
            dsh, q[..., sl], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        if _SOFTMAX_BASE2:
            dkh = dkh * float(np.log(2.0))
        dk_ref[..., sl] = dkh.astype(dk_ref.dtype)
        dv_ref[..., sl] = jax.lax.dot_general(
            pd[:, rows], g[..., sl], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _block_batches(tq: int, tk: int, hidden: int, n_heads: int,
                   n_temps: int, n_operands: int,
                   vmem_budget: int = 8 * 2**20) -> int:
    """Batches per grid step for the head-STACKED kernels: ``n_temps``
    live (GB, H*Tq, Tk) score-stack temporaries + operand blocks in VMEM.
    Budget tuned on hardware: the flagship shape (Tq=Tk=200, H*D=256,
    H=8) compiles at gb=2 fwd / gb=1 bwd and fails one block size up."""
    per_batch = (n_heads * tq * tk * 4 * n_temps
                 + n_operands * tq * hidden * 4)
    return max(1, vmem_budget // per_batch)


def _pad_b(x, gb: int):
    pad = (-x.shape[0]) % gb
    if pad:
        x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
    return x


def _specs(gb: int, tq: int, tk: int, hidden: int):
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


def _mha_impl(q, k, v, key_pad, static, seed, scale, dropout_rate,
              n_heads, d_head, with_lse):
    """Forward pallas_call. With ``with_lse`` (the VJP forward) also
    returns ml (B, 8, H*Tq) carrying the softmax row max (row 0) and
    ``log(l)`` (row 1; rows 2-7 are Mosaic tile padding) — the residual
    the backward consumes. The primal/eval forward passes False and pays
    no sidecar write (a pallas output cannot be DCE'd by XLA)."""
    B, Tq, hidden = q.shape
    Tk = k.shape[1]
    # with dropout the fwd/bwd grids MUST tile the batch axis identically
    # (ONE stacked draw per grid step): use the bwd-safe block size
    if dropout_rate > 0.0:
        gb = min(_bwd_block(Tq, Tk, hidden, n_heads, dropout_rate), B)
    else:
        gb = min(_block_batches(Tq, Tk, hidden, n_heads,
                                n_temps=2, n_operands=4), B)
    qp, kp, vp = _pad_b(q, gb), _pad_b(k, gb), _pad_b(v, gb)
    pad_p = _pad_b(key_pad, gb)
    kernel = functools.partial(_attn_fwd_kernel, scale=scale,
                               dropout_rate=dropout_rate, n_heads=n_heads,
                               d_head=d_head)
    Bp = qp.shape[0]
    blk_o = pl.BlockSpec((gb, Tq, hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_ml = pl.BlockSpec((gb, 8, n_heads * Tq), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    out_specs = [blk_o, blk_ml] if with_lse else [blk_o]
    out_shape = [jax.ShapeDtypeStruct(qp.shape, q.dtype)]
    if with_lse:
        out_shape.append(
            jax.ShapeDtypeStruct((Bp, 8, n_heads * Tq), jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=(Bp // gb,),
        in_specs=_specs(gb, Tq, Tk, hidden),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_should_interpret(),
    )(seed, qp, kp, vp, pad_p, static)
    if with_lse:
        out, ml = res
        return out[:B], ml[:B]
    return res[0][:B], None


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _flash_mha(q, k, v, key_pad, static, seed, scale, dropout_rate,
               n_heads, d_head):
    """q: (B, Tq, H*D); k/v: (B, Tk, H*D); key_pad: (B, 1, Tk) int32;
    static: (1, Tq, Tk) int32; seed: (1, 1) int32."""
    return _mha_impl(q, k, v, key_pad, static, seed, scale, dropout_rate,
                     n_heads, d_head, with_lse=False)[0]


def _flash_mha_fwd(q, k, v, key_pad, static, seed, scale, dropout_rate,
                   n_heads, d_head):
    out, ml = _mha_impl(q, k, v, key_pad, static, seed, scale,
                        dropout_rate, n_heads, d_head, with_lse=True)
    return out, (q, k, v, key_pad, static, seed, ml)


def _bwd_block(Tq, Tk, hidden, n_heads, dropout_rate):
    """bwd block size: 2 scratch stacks + ~2 live stacked temporaries
    (+1 dropout keep mask) + 7 operand blocks."""
    return _block_batches(Tq, Tk, hidden, n_heads,
                          n_temps=5 if dropout_rate > 0.0 else 4,
                          n_operands=7)


def _flash_mha_bwd(scale, dropout_rate, n_heads, d_head, res, g):
    q, k, v, key_pad, static, seed, ml = res
    B, Tq, hidden = q.shape
    Tk = k.shape[1]
    # The dropout replay stays exact: one stacked draw per grid step, and
    # with dropout the fwd grid tiles the same batch axis (same gb).
    gb = min(_bwd_block(Tq, Tk, hidden, n_heads, dropout_rate), B)
    qp, kp, vp, gp = (_pad_b(x, gb) for x in (q, k, v, g))
    mlp = _pad_b(ml, gb)
    pad_p = _pad_b(key_pad, gb)
    kernel = functools.partial(
        _attn_bwd_kernel, scale=scale, dropout_rate=dropout_rate,
        n_heads=n_heads, d_head=d_head,
        dots_dtype=jnp.float32 if _should_interpret() else jnp.bfloat16,
        use_saved_lse=_BWD_USE_SAVED_LSE)
    blk_q = pl.BlockSpec((gb, Tq, hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_k = pl.BlockSpec((gb, Tk, hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    blk_ml = pl.BlockSpec((gb, 8, n_heads * Tq), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(qp.shape[0] // gb,),
        in_specs=_specs(gb, Tq, Tk, hidden) + [blk_q, blk_ml],
        out_specs=[blk_q, blk_k, blk_k],
        out_shape=[jax.ShapeDtypeStruct(qp.shape, q.dtype),
                   jax.ShapeDtypeStruct(kp.shape, k.dtype),
                   jax.ShapeDtypeStruct(vp.shape, v.dtype)],
        scratch_shapes=[pltpu.VMEM((gb, n_heads * Tq, Tk), jnp.float32),
                        pltpu.VMEM((gb, n_heads * Tq, Tk), jnp.float32)],
        interpret=_should_interpret(),
    )(seed, qp, kp, vp, pad_p, static, gp, mlp)
    zeros = lambda x: np.zeros(x.shape, dtype=jax.dtypes.float0)
    return (dq[:B], dk[:B], dv[:B], zeros(key_pad), zeros(static),
            zeros(seed))


_flash_mha.defvjp(_flash_mha_fwd, _flash_mha_bwd)


# ---------------------------------------------------------------------------
# tensor parallelism: shard_map over the 'model' axis (heads sharded)
# ---------------------------------------------------------------------------
#
# The fused kernel is a custom call XLA's SPMD partitioner cannot split, but
# its per-head independence makes the head split exact: under a mesh with a
# >1 'model' axis, each device runs the kernel on its local n_heads/tp heads
# of the already column-sharded q/k/v projections (Megatron pattern,
# parallel/partition.py), producing the hidden-sharded output the
# row-sharded out_proj consumes — zero resharding on either side.
# Set with ``tp_attention(mesh)`` (the trainer does this around tracing).

_TP_STATE: dict = {"mesh": None, "axis": "model"}


def set_tp_mesh(mesh, axis: str = "model") -> None:
    """Enable (mesh) / disable (None) TP sharding of the fused kernel."""
    _TP_STATE["mesh"] = mesh
    _TP_STATE["axis"] = axis


class tp_attention:
    """Context manager: fused-kernel TP over ``mesh``'s ``axis``."""

    def __init__(self, mesh, axis: str = "model"):
        self.mesh, self.axis = mesh, axis

    def __enter__(self):
        self.prev = dict(_TP_STATE)
        set_tp_mesh(self.mesh, self.axis)

    def __exit__(self, *exc):
        _TP_STATE.update(self.prev)


def tp_mesh_active() -> bool:
    """True when a >1 'model'-axis mesh is registered (tp_attention /
    set_tp_mesh). Model code uses this to skip apply-time kernel fusions
    (e.g. the QKV wide-GEMM concat in models/layers.py) that would
    concatenate along a column-sharded axis and force resharding."""
    mesh, axis = _TP_STATE["mesh"], _TP_STATE["axis"]
    return (mesh is not None and axis in mesh.shape
            and int(mesh.shape[axis]) > 1)


def _tp_mesh_axis(n_heads: int, hidden: int):
    """(mesh, axis, tp) when TP applies to this call, else (None, None, 1)."""
    mesh, axis = _TP_STATE["mesh"], _TP_STATE["axis"]
    if mesh is None or axis not in mesh.shape:
        return None, None, 1
    tp = int(mesh.shape[axis])
    if tp <= 1 or n_heads % tp or hidden % tp:
        return None, None, 1
    return mesh, axis, tp


def _fold_shard_seed(seed, model_idx, data_idx):
    """Per-shard dropout seed: distinct for every (model, data) mesh
    coordinate so dropout draws are decorrelated across BOTH the
    head-sharded ('model') and batch-sharded ('data') axes. Odd
    multipliers, so the map (model_idx, data_idx) -> offset is injective
    for any realistic mesh (data offset stride 0x9E3D1 ≫ model axis
    size × 0x18D4F)."""
    s = seed + model_idx.astype(seed.dtype) * np.int32(0x18D4F)
    if data_idx is not None:
        s = s + data_idx.astype(seed.dtype) * np.int32(0x9E3D1)
    return s


def _flash_mha_tp(q, k, v, key_pad, static, seed, scale, dropout_rate,
                  n_heads, d_head, mesh, axis):
    """shard_map the fused kernel: heads (the hidden dim) over ``axis``,
    batch over 'data' when the mesh has it. Exact per shard — softmax and
    output rows are head-local. Dropout draws are decorrelated across
    shards by folding BOTH mesh coordinates into the seed
    (``_fold_shard_seed``; the pattern differs from the single-device
    kernel but is the same Bernoulli process)."""
    from jax.sharding import PartitionSpec as P

    tp = int(mesh.shape[axis])
    n_local = n_heads // tp
    data = "data" if "data" in mesh.shape else None

    def body(q, k, v, key_pad, static, seed):
        s = _fold_shard_seed(
            seed, jax.lax.axis_index(axis),
            jax.lax.axis_index(data) if data is not None else None)
        return _flash_mha(q, k, v, key_pad, static, s, scale, dropout_rate,
                          n_local, d_head)

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(data, None, axis), P(data, None, axis),
                  P(data, None, axis), P(data, None, None), P(), P()),
        out_specs=P(data, None, axis),
        check_vma=False)
    return fn(q, k, v, key_pad, static, seed)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def _xla_attention(q, k, v, bias, n_heads, dropout_rate, dropout_key):
    """Reference-math oracle on (B, T, H*D) operands."""
    B, Tq, hidden = q.shape
    Tk = k.shape[1]
    D = hidden // n_heads
    scale = 1.0 / np.sqrt(D)

    def split(x, T):
        return x.reshape(B, T, n_heads, D).transpose(0, 2, 1, 3)

    qh = split(q.astype(jnp.float32), Tq)
    kh = split(k.astype(jnp.float32), Tk)
    vh = split(v.astype(jnp.float32), Tk)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) * scale
    s = s + bias[:, None, :, :]
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_key, 1.0 - dropout_rate, p.shape)
        p = jnp.where(keep, p, 0.0) / (1.0 - dropout_rate)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return out.transpose(0, 2, 1, 3).reshape(B, Tq, hidden).astype(q.dtype)


def multi_head_attention(
    q: jnp.ndarray,                        # (B, Tq, hidden)
    k: jnp.ndarray,                        # (B, Tk, hidden)
    v: jnp.ndarray,                        # (B, Tk, hidden)
    n_heads: int,
    mask: Optional[jnp.ndarray] = None,    # (B, Tq, Tk) 1=attend (full form)
    bias: Optional[jnp.ndarray] = None,    # additive, overrides mask
    mask_spec: Optional[MaskSpec] = None,  # decomposed form (kernel-native)
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    impl: str = "pallas",
) -> jnp.ndarray:
    """Fused MHA over already-projected q/k/v; returns (B, Tq, hidden).

    Prefer ``mask_spec`` (key-pad + static decomposition): the fused kernel
    consumes it directly. A full ``mask``/``bias`` tensor cannot ride the
    kernel's operand layout and falls back to the XLA oracle path.
    """
    B, Tq, hidden = q.shape
    Tk = k.shape[1]
    assert hidden % n_heads == 0, "hidden size not divisible by n_heads"
    D = hidden // n_heads
    scale = 1.0 / np.sqrt(D)

    if dropout_rate > 0.0 and dropout_key is None:
        raise ValueError("dropout_rate > 0 requires dropout_key")

    if impl == "pallas" and (mask is not None or bias is not None):
        impl = "xla"                      # full masks -> oracle path
    if impl == "pallas" and dropout_rate > 0.0 and _should_interpret():
        impl = "xla"  # pltpu.prng_* is TPU-only; interpret mode -> oracle

    if impl == "xla":
        if bias is None:
            if mask is not None:
                bias = mask_to_bias(mask)
            elif mask_spec is not None:
                bias = spec_to_bias(mask_spec, B, Tq, Tk)
            else:
                bias = jnp.zeros((B, Tq, Tk), jnp.float32)
        return _xla_attention(q, k, v, bias.astype(jnp.float32), n_heads,
                              dropout_rate, dropout_key)

    # ---- fused kernel path ----
    spec = mask_spec or MaskSpec()
    if spec.key_pad is not None:
        key_pad = spec.key_pad.reshape(B, 1, Tk).astype(jnp.int32)
    else:
        # no pad term: attend comes from static only (or everything when
        # static is also None)
        fill = 0 if spec.static is not None else 1
        key_pad = jnp.full((B, 1, Tk), fill, jnp.int32)
    static = (spec.static.astype(jnp.int32).reshape(1, Tq, Tk)
              if spec.static is not None
              else jnp.zeros((1, Tq, Tk), jnp.int32))

    if dropout_rate > 0.0:
        seed = jax.random.randint(dropout_key, (1, 1), 0,
                                  np.int32(2**31 - 1), dtype=jnp.int32)
    else:
        seed = jnp.zeros((1, 1), jnp.int32)

    mesh, axis, tp = _tp_mesh_axis(n_heads, hidden)
    if tp > 1:
        return _flash_mha_tp(q, k, v, key_pad, static, seed, scale,
                             float(dropout_rate), n_heads, D, mesh, axis)
    return _flash_mha(q, k, v, key_pad, static, seed, scale,
                      float(dropout_rate), n_heads, D)
