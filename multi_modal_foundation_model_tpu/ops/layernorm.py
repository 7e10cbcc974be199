"""Fused Pallas LayerNorm (forward + backward) — a measured-OFF switch.

Why it was built: the round-4 device trace decomposed the "matmul
fusion" class and found ~5.5 ms/step of the B=256 production step is
LayerNorm *backward* fusions (29 ``multiply_reduce_fusion`` at 215 GB/s
+ 26 ``convert_reduce_fusion`` at 333 GB/s). One Pallas pass per
direction reads x/dy once at near HBM bandwidth: the forward computes
stats + normalize in one VMEM-resident block sweep; the backward
recomputes the (cheap, lane-local) stats instead of saving them — zero
residuals beyond ``x`` itself, which autodiff already keeps — and
accumulates dgamma/dbeta across the sequential grid into one revisited
(1, H) block.

Why it is off: both kernel modes measured SLOWER in production (see
``PALLAS_LAYERNORM`` below) even though the backward kernel is 1.8x
faster than XLA's VJP in isolation. Those 215-333 GB/s XLA fusions are
not "slow LN" — they are fused neighborhoods doing several ops' traffic
in one pass, which an opaque custom call at 27 sites can only break.
The experiment retires the LN class as at-floor and stays one flag-flip
away with parity tests, like MXU_BIAS_GRAD / REPLAY_DROPOUT.

Semantics match ``flax.linen.LayerNorm(use_fast_variance=True)`` — the
norm the model uses everywhere (``models/layers.py:_norm``, epsilon 1e-5
to match torch, reference ``mm_utils.py``):

- stats in f32: ``mu = mean(x)``, ``var = relu(mean(x^2) - mu^2)``
- ``y = (x - mu) * (rsqrt(var + eps) * scale) + bias`` computed in f32
- output cast to ``dtype`` (or the x/params promotion when None)

The backward is the standard LN VJP (f32 throughout):

- ``dxhat = dy * scale``
- ``dx = rsigma * (dxhat - mean_H(dxhat) - xhat * mean_H(dxhat*xhat))``
- ``dgamma = sum_tokens(dy * xhat)``, ``dbeta = sum_tokens(dy)``

``FusedLayerNorm`` is an ``nn.LayerNorm`` twin (same 'scale'/'bias'
param tree, so checkpoints and the torch converter are untouched); on
non-TPU backends it runs the identical math as plain XLA ops (bit-equal
to ``nn.LayerNorm`` — pinned by tests), keeping CPU tests and the
reference-parity suite on the exact flax semantics.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Dtype = Any

# A/B switch (same policy as MXU_BIAS_GRAD / _SOFTMAX_BASE2):
#   "off"  — XLA math everywhere (fwd and bwd fuse freely)
#   "bwd"  — XLA forward (stays fusable into neighboring GEMM epilogues),
#            Pallas one-pass backward
#   "full" — Pallas forward AND backward
#
# Measured on the B=256 production step (2026-08-19, interleaved
# min-of-passes): "full" 75.6 ms, "bwd" 74.0 ms, "off" 69.9 ms — the
# kernels LOSE in situ despite the backward being 1.8x faster than
# XLA's VJP in isolation (117.5 vs 211.3 us, 670 vs 372 GB/s at the
# 51200x256 trunk shape, /tmp-microbench chained-scan marginal). The
# gap is fusion, not kernel speed: a custom call forces dy and dx to
# materialize in HBM at all 27 norm sites, where XLA instead fuses the
# LN backward into the dy-producing fusions (its 215-333 GB/s
# "multiply_reduce" fusions are doing several ops' traffic in one
# pass). Default "off": the LN class is at its measured floor.
PALLAS_LAYERNORM = "off"

# tokens per grid step. Sized for the backward's scoped-VMEM stack: at
# H=256 the bwd kernel holds ~10 f32 block temporaries (x, g, xhat,
# dxhat, dx, products); 2048-row f32 blocks overflow the 16 MB scoped
# limit (measured: 21.96M requested), 1024 fits with headroom.
_BM = 1024


def _out_dtype(x, dtype):
    return dtype or jnp.promote_types(x.dtype, jnp.float32)


def _xla_layernorm(x, scale, bias, eps: float, dtype):
    """flax.linen.LayerNorm math (fast variance), functional form."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jax.nn.relu(jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu)
    mul = jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
    y = (x32 - mu) * mul + bias.astype(jnp.float32)
    return y.astype(_out_dtype(x, dtype))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _ln_fwd_kernel(x_ref, s_ref, b_ref, y_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jax.nn.relu(jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu)
    mul = jax.lax.rsqrt(var + eps) * s_ref[...].astype(jnp.float32)
    y_ref[...] = ((x - mu) * mul
                  + b_ref[...].astype(jnp.float32)).astype(y_ref.dtype)


def _ln_bwd_kernel(x_ref, s_ref, g_ref, dx_ref, dg_ref, db_ref, *,
                   eps: float):
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jax.nn.relu(jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu)
    rsigma = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * rsigma
    dxhat = g * s_ref[...].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ref[...] = (rsigma * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)
    # dgamma/dbeta accumulate across the (sequential) TPU grid into one
    # (1, H) block — revisited every step via a constant index map, so no
    # XLA fold pass and no per-block partial array (whose (1, H) blocks
    # over a (grid, H) array Mosaic rejects for grid > 1)
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
    dg_ref[...] += jnp.sum(g * xhat, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(g, axis=0, keepdims=True)


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_tokens(x2, bm):
    m = x2.shape[0]
    mp = -(-m // bm) * bm
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    return x2, m


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _pallas_layernorm(x, scale, bias, eps: float, out_dtype):
    return _pallas_ln_fwd(x, scale, bias, eps, out_dtype)[0]


def _pallas_ln_fwd(x, scale, bias, eps: float, out_dtype):
    H = x.shape[-1]
    x2 = x.reshape(-1, H)
    bm = min(_BM, -(-x2.shape[0] // 32) * 32)
    x2, m = _pad_tokens(x2, bm)
    grid = x2.shape[0] // bm
    y = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((bm, H), lambda i: (i, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, H), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x2.shape, out_dtype),
        interpret=_should_interpret(),
    )(x2, scale.reshape(1, H), bias.reshape(1, H))
    return y[:m].reshape(x.shape), (x, scale)


def _pallas_ln_bwd(eps: float, out_dtype, res, g):
    x, scale = res
    H = x.shape[-1]
    x2 = x.reshape(-1, H)
    g2 = g.reshape(-1, H)
    bm = min(_BM, -(-x2.shape[0] // 32) * 32)
    x2, m = _pad_tokens(x2, bm)
    g2, _ = _pad_tokens(g2, bm)      # zero-padded -> no dgamma/dbeta leak
    grid = x2.shape[0] // bm
    dx, dg, db = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps=eps),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((bm, H), lambda i: (i, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((bm, H), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, H), lambda i: (i, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
            pl.BlockSpec((1, H), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x2.shape, x.dtype),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
        ],
        interpret=_should_interpret(),
    )(x2, scale.reshape(1, H), g2)
    return (dx[:m].reshape(x.shape),
            dg[0].astype(scale.dtype),
            db[0].astype(scale.dtype))


_pallas_layernorm.defvjp(_pallas_ln_fwd, _pallas_ln_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _bwdonly_layernorm(x, scale, bias, eps: float, out_dtype):
    """XLA forward (fuses into neighbors like plain nn.LayerNorm),
    Pallas one-pass backward."""
    return _xla_layernorm(x, scale, bias, eps, out_dtype)


def _bwdonly_fwd(x, scale, bias, eps: float, out_dtype):
    return _xla_layernorm(x, scale, bias, eps, out_dtype), (x, scale)


_bwdonly_layernorm.defvjp(_bwdonly_fwd, _pallas_ln_bwd)


class FusedLayerNorm(nn.Module):
    """``nn.LayerNorm(use_fast_variance=True)`` twin backed by the fused
    Pallas kernels on TPU (same 'scale'/'bias' param tree and init; XLA
    math elsewhere and when ``PALLAS_LAYERNORM`` is off)."""

    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        H = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (H,))
        bias = self.param("bias", nn.initializers.zeros, (H,))
        mode = PALLAS_LAYERNORM
        if (mode not in ("bwd", "full") or H % 128 != 0
                or _should_interpret() or jax.device_count() > 1):
            # XLA form (same math, pinned by tests) when: the switch is
            # off; H isn't lane-aligned; non-TPU backend (interpret-mode
            # pallas round-trips every block through the emulator); or a
            # multi-device process — a raw pallas custom call is opaque to
            # the SPMD partitioner (the attention kernel crosses meshes
            # via explicit shard_map; LN is cheap enough that the
            # partitionable XLA form is the right multi-chip trade)
            return _xla_layernorm(x, scale, bias, self.epsilon, self.dtype)
        fn = _pallas_layernorm if mode == "full" else _bwdonly_layernorm
        return fn(x, scale, bias, self.epsilon, _out_dtype(x, self.dtype))
