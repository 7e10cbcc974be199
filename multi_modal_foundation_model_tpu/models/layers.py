"""Transformer building blocks (flax linen) and tokenizers.

Functional rebuilds of the reference primitives:

- ``ModalityTokenizer``      <- EncoderEmbeddingLayer / DecoderEmbeddingLayer
  token path (``/root/reference/src/multi_modal/encoder_embeddings.py:19-61``,
  ``decoder_embeddings.py:19-61``): Dense(C -> C*mult) -> act -> *scale ->
  Dense(-> H) -> dropout. Positional/modality embeddings are owned by the
  parent model (so modality-embedding *sharing* between encoder and decoder
  is plain module reuse instead of post-hoc aliasing; cf. ``mm.py:84-87``).
- ``Attention``/``CrossAttention``  <- ``mm_utils.py:76-152``, with the
  fused Pallas/XLA kernel from ``ops.attention`` instead of torch SDPA.
- ``MLP``, ``ScaleNorm``     <- ``mm_utils.py:31-52``.
- ``EncoderLayer``/``DecoderLayer`` pre-norm residual blocks with fixup
  initialization (``encoder_embeddings.py:91-129``,
  ``decoder_embeddings.py:112-160``): output-projection kernels scaled by
  ``0.67 * n_layers**-0.25`` and value kernels additionally by sqrt(2).

Initialization matches torch defaults (U(+-1/sqrt(fan_in)) for Dense kernel
and bias; N(0,1) for embeddings) so training dynamics are comparable.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import MaskSpec, multi_head_attention, tp_mesh_active


def _attn_call(q, k, v, n_heads, mask, dropout_rate, dropout_key, impl):
    """Dispatch on mask form: MaskSpec rides the fused kernel; full arrays
    fall back to the oracle path inside multi_head_attention."""
    if isinstance(mask, MaskSpec) or mask is None:
        return multi_head_attention(
            q, k, v, n_heads, mask_spec=mask, dropout_rate=dropout_rate,
            dropout_key=dropout_key, impl=impl)
    return multi_head_attention(
        q, k, v, n_heads, mask=mask, dropout_rate=dropout_rate,
        dropout_key=dropout_key, impl=impl)

ACT2FN = {
    "gelu": nn.gelu,
    "relu": nn.relu,
    "silu": nn.silu,
    "softsign": nn.soft_sign,
    "tanh": jnp.tanh,
    "identity": lambda x: x,
}

Dtype = Any


def torch_linear_init(scale: float = 1.0) -> Callable:
    """Kernel init: U(+-1/sqrt(fan_in)) * scale (torch Linear default,
    optionally fixup-rescaled). Dense kernels are (fan_in, fan_out)."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(shape[0])
        return jax.random.uniform(key, shape, dtype, -bound, bound) * scale

    return init


def torch_bias_init(fan_in: int) -> Callable:
    """Bias init: U(+-1/sqrt(fan_in)) (torch Linear default)."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def fixup_scaled_init(n_layers: int, value: bool = False) -> Callable:
    """Fixup rescaling of the torch-default init (reference
    ``fixup_initialization``): ``0.67 * n_layers**-0.25`` for *_proj
    kernels, x sqrt(2) more for value kernels."""
    factor = 0.67 * float(n_layers) ** (-0.25)
    if value:
        factor *= np.sqrt(2.0)
    return torch_linear_init(scale=factor)


# When True, Dense bias gradients ride the dW GEMM on the MXU
# (``_matmul_fused_bias_grad``) instead of XLA's (B*T)-axis reduce fusions.
# Module-level so a bench can A/B both compilations within one process.
#
# MEASURED NEGATIVE on the flagship B=256 step (round 4, alternating
# in-process A/B, 4 reps): 72.4 ms/step vs 70.4 baseline. Autodiff's dW+db
# pair already fuses the bias reduce into the dW GEMM epilogue when XLA
# chooses to (micro: 110 us vs 124 us for the explicit ones-row GEMM); the
# standalone 110-240 us db reduce fusions seen in the device trace are the
# sites XLA deliberately split, and forcing them through custom_vjp dots
# costs more than it saves. Kept as a tested-off switch so nobody re-runs
# the experiment blind (same policy as base-2 softmax, RESULTS.md round 3).
MXU_BIAS_GRAD = False


@jax.custom_vjp
def _matmul_fused_bias_grad(x, kernel, bias):
    """``x @ kernel + bias`` whose bias GRADIENT is one extra MXU row.

    XLA compiles ``db = sum(g, axis=(0, 1))`` as a standalone reduce fusion
    over the (B*T)-major axes — measured 110-240 us per bias at B=256 (7x
    off HBM bandwidth; cross-sublane adds run at VPU reduce throughput),
    ~6 ms/step across the model's ~40 bias sites. The dW GEMM already
    contracts the same (B*T) axis over the same ``g``: appending a ones
    column to x makes ``dWb = [x, 1]^T @ g`` — dW plus db in ONE GEMM,
    one extra output row (M 256->257, sublane-pad noise). Forward dot and
    dx dot are bit-identical to ``nn.Dense``'s; dW keeps the identical
    contraction per output element (f32 accumulation order unchanged);
    db moves from a VPU tree-reduce to an MXU f32 accumulate.
    """
    y = jax.lax.dot_general(x, kernel,
                            (((x.ndim - 1,), (0,)), ((), ())))
    return y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))


def _matmul_fbg_fwd(x, kernel, bias):
    return _matmul_fused_bias_grad(x, kernel, bias), (x, kernel)


def _matmul_fbg_bwd(res, g):
    x, kernel = res
    lead = tuple(range(g.ndim - 1))
    # dx and dW mirror autodiff's dots exactly (3-D dot_general over the
    # leading dims — no reshape, which would force a relayout copy on the
    # {2,0,1}-layout trunk activations)
    dx = jax.lax.dot_general(g, kernel,
                             (((g.ndim - 1,), (1,)), ((), ())))
    dw = jax.lax.dot_general(x, g, ((lead, lead), ((), ())),
                             preferred_element_type=jnp.float32)
    # db as a ones-row GEMM over g: MXU f32 accumulate at g's read
    # bandwidth, replacing XLA's cross-sublane reduce fusion (measured
    # 110-240 us/site at B=256). M=8 because the MXU processes 8 sublanes
    # per pass anyway; row 0 is the sum.
    ones = jnp.ones((8,) + tuple(g.shape[:-1]), g.dtype)
    db = jax.lax.dot_general(ones, g, ((tuple(range(1, g.ndim)), lead),
                                       ((), ())),
                             preferred_element_type=jnp.float32)[0]
    return dx, dw.astype(kernel.dtype), db.astype(kernel.dtype)


_matmul_fused_bias_grad.defvjp(_matmul_fbg_fwd, _matmul_fbg_bwd)


def _apply_dense(x, kernel, bias, dtype):
    """Promote + matmul(+bias); bias grads via the MXU when enabled."""
    x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=dtype)
    if bias is None:
        return jax.lax.dot_general(x, kernel,
                                   (((x.ndim - 1,), (0,)), ((), ())))
    if MXU_BIAS_GRAD:
        return _matmul_fused_bias_grad(x, kernel, bias)
    y = jax.lax.dot_general(x, kernel, (((x.ndim - 1,), (0,)), ((), ())))
    return y + jnp.reshape(bias, (1,) * (y.ndim - 1) + (-1,))


class MXUDense(nn.Module):
    """``nn.Dense`` twin (same param tree: 'kernel'/'bias', same init and
    forward math) whose bias gradient rides the dW GEMM
    (``_matmul_fused_bias_grad``) instead of a standalone reduce fusion."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        bias = (self.param("bias", self.bias_init, (self.features,))
                if self.use_bias else None)
        return _apply_dense(x, kernel, bias, self.dtype)


def _dense(features: int, fan_in: int, use_bias: bool = True,
           kernel_init: Optional[Callable] = None, name: Optional[str] = None,
           dtype: Dtype = None) -> MXUDense:
    return MXUDense(
        features,
        use_bias=use_bias,
        kernel_init=kernel_init or torch_linear_init(),
        bias_init=torch_bias_init(fan_in),
        name=name,
        dtype=dtype,
    )


# When True, dropout regenerates its keep mask from the PRNG key in the
# backward pass instead of saving it, eliminating the u32 random-bit
# residuals (100 MiB x ~10 sites at B=256 in the device trace).
#
# MEASURED NEUTRAL on the flagship B=256 step (round 4): 70.41 vs
# 70.46 ms/step, and compiled peak HBM identical to the byte
# (4.633 GB both ways) — the residual copies are async copy-starts with
# zero attributed device time (fully overlapped behind compute), and the
# backward's RNG replay costs about what the residual reads saved. Kept
# as a tested-off switch; it may matter on memory-constrained shapes
# where the 1 GB of residuals forces rematerialization elsewhere.
REPLAY_DROPOUT = False

# u8-threshold keep-mask generation (VERDICT r4 ask #7): jax.random's
# bernoulli converts u32 bits to f32 and compares against the rate —
# measured 39 us/site at (256,200,256); thresholding 8 random bits per
# element on the integer lanes instead measured 21 us/site (~2x).
# DEFAULT ON since round 5: the whole-step interleaved A/B at the
# flagship B=256 shape measured 68.95 vs 70.69 ms/step (+2.5% seq/s,
# RESULTS.md round 5). Semantics under the default:
# - the keep probability quantizes to round((1-rate)*256)/256 (within
#   1/512 of exact; survivors are rescaled by the exact quantized
#   probability so the estimator stays unbiased);
# - the keep-mask RNG STREAM differs from flax's bernoulli draw, so
#   flipping the flag changes training trajectories — same contract as
#   the in-kernel attention dropout's own stream. Set False for the
#   legacy stream (bit-identical to ``nn.Dropout``).
# Distribution parity + unbiasedness: tests/test_models.py
# (test_u8_dropout_*).
U8_DROPOUT_BITS = True


def _dropout_keep(key, rate: float, shape):
    """(keep mask, exact keep probability) for one dropout site under the
    active bit-generation policy (see ``U8_DROPOUT_BITS``). Callers divide
    survivors by the keep probability — division keeps the default path
    bit-identical to ``nn.Dropout`` and the u8 path unbiased."""
    if not U8_DROPOUT_BITS:
        return jax.random.bernoulli(key, 1.0 - rate, shape), 1.0 - rate
    t = int(round(rate * 256.0))            # drop iff bits < t
    keep_p = (256 - t) / 256.0              # exact quantized keep prob
    bits = jax.random.bits(key, shape, dtype=jnp.uint8)
    return bits >= np.uint8(t), keep_p


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _replay_dropout(x, key, rate: float):
    """nn.Dropout math (bernoulli keep at 1-rate, inverse-scale survivors)
    with a zero-residual VJP: only ``key`` is saved; backward replays the
    identical draw."""
    keep, keep_p = _dropout_keep(key, rate, x.shape)
    return jax.lax.select(keep, x / keep_p, jnp.zeros_like(x))


def _replay_dropout_fwd(x, key, rate: float):
    return _replay_dropout(x, key, rate), key


def _replay_dropout_bwd(rate: float, key, g):
    keep, keep_p = _dropout_keep(key, rate, g.shape)
    dx = jax.lax.select(keep, g / keep_p, jnp.zeros_like(g))
    return dx, np.zeros(key.shape, dtype=jax.dtypes.float0)


_replay_dropout.defvjp(_replay_dropout_fwd, _replay_dropout_bwd)


class ReplayDropout(nn.Module):
    """``nn.Dropout`` twin whose backward replays the PRNG draw instead of
    saving the keep mask (see ``REPLAY_DROPOUT``). Same draw per call site
    (one ``make_rng('dropout')``), same select/scale math."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        key = self.make_rng("dropout")
        if not REPLAY_DROPOUT:
            keep, keep_p = _dropout_keep(key, self.rate, x.shape)
            return jax.lax.select(keep, x / keep_p, jnp.zeros_like(x))
        return _replay_dropout(x, key, self.rate)


class ScaleNorm(nn.Module):
    """Learned-scale RMS-style norm (``mm_utils.py:31-39``)."""

    scale_init: float
    eps: float = 1e-5
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", lambda k: jnp.asarray(self.scale_init,
                                                          jnp.float32))
        norm = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
        out = x * (scale / jnp.clip(norm, self.eps, None)).astype(x.dtype)
        return out


class MLP(nn.Module):
    """up-proj -> act -> down-proj -> dropout (``mm_utils.py:42-52``)."""

    hidden_size: int
    inter_size: int
    act: str
    use_bias: bool
    dropout: float
    n_layers_fixup: Optional[int] = None
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        fix = self.n_layers_fixup
        up_init = fixup_scaled_init(fix) if fix else torch_linear_init()
        down_init = fixup_scaled_init(fix) if fix else torch_linear_init()
        x = _dense(self.inter_size, self.hidden_size, self.use_bias,
                   kernel_init=up_init, name="up_proj", dtype=self.dtype)(x)
        x = ACT2FN[self.act](x)
        x = _dense(self.hidden_size, self.inter_size, self.use_bias,
                   kernel_init=down_init, name="down_proj", dtype=self.dtype)(x)
        return ReplayDropout(self.dropout)(x, deterministic=deterministic)


class _ProjParams(nn.Module):
    """Parameter-only projection scope: owns ``kernel``/``bias`` at the same
    param path (and with the same init, hence identical values) as an
    ``nn.Dense`` of the same name, without applying it — the parent fuses
    several projections into ONE wide GEMM. Keeping the per-projection param
    tree means checkpoints, the torch converter and the TP partition rules
    are all unaffected by the fusion."""

    features: int
    fan_in: int
    use_bias: bool
    kernel_init: Callable

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init,
                            (self.fan_in, self.features))
        bias = (self.param("bias", torch_bias_init(self.fan_in),
                           (self.features,))
                if self.use_bias else None)
        return kernel, bias


def _fused_proj(x, projs, dtype):
    """Apply several same-input projections as one wide GEMM.

    ``projs``: list of (kernel, bias) from _ProjParams. Concatenating the
    kernels along the output axis keeps each output column's dot product
    (and hence its f32/MXU accumulation order) identical to the separate
    GEMMs — bit-exact fusion — while reading ``x`` once instead of
    len(projs) times and presenting the MXU one N=sum(features) GEMM.
    The backward fuses symmetrically: one dX GEMM with K=sum(features)
    instead of three K=features GEMMs. Returns the per-projection splits.
    """
    W = jnp.concatenate([k for k, _ in projs], axis=1)
    biases = [b for _, b in projs]
    b = (jnp.concatenate(biases) if biases[0] is not None else None)
    y = _apply_dense(x, W, b, dtype)
    sizes = np.cumsum([k.shape[1] for k, _ in projs])[:-1]
    return jnp.split(y, sizes, axis=-1)


class Attention(nn.Module):
    """Self-attention with fused kernel (``mm_utils.py:76-114``).

    The q/k/v projections run as ONE (fan, 3H) GEMM (``_fused_proj``)
    unless a >1 'model'-axis TP mesh is registered — the kernels are
    column-sharded under TP and concatenation would force resharding."""

    hidden_size: int
    n_heads: int
    use_bias: bool
    dropout: float
    n_layers_fixup: Optional[int] = None
    attn_impl: str = "pallas"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        h, fan = self.hidden_size, self.hidden_size
        fix = self.n_layers_fixup
        v_init = (fixup_scaled_init(fix, value=True) if fix
                  else torch_linear_init())
        if tp_mesh_active():
            q = _dense(h, fan, self.use_bias, name="query",
                       dtype=self.dtype)(x)
            k = _dense(h, fan, self.use_bias, name="key",
                       dtype=self.dtype)(x)
            v = _dense(h, fan, self.use_bias, kernel_init=v_init,
                       name="value", dtype=self.dtype)(x)
        else:
            projs = [
                _ProjParams(h, fan, self.use_bias, torch_linear_init(),
                            name="query")(),
                _ProjParams(h, fan, self.use_bias, torch_linear_init(),
                            name="key")(),
                _ProjParams(h, fan, self.use_bias, v_init, name="value")(),
            ]
            q, k, v = _fused_proj(x, projs, self.dtype)
        drop_rate = 0.0 if deterministic else self.dropout
        drop_key = (self.make_rng("dropout")
                    if drop_rate > 0.0 else None)
        out = _attn_call(q, k, v, self.n_heads, mask, drop_rate, drop_key,
                         self.attn_impl)
        out = ReplayDropout(self.dropout)(out, deterministic=deterministic)
        return _dense(h, fan, self.use_bias,
                      kernel_init=(fixup_scaled_init(fix) if fix
                                   else torch_linear_init()),
                      name="out_proj", dtype=self.dtype)(out)


class CrossAttention(nn.Module):
    """Cross-attention: K/V from context (``mm_utils.py:118-152``)."""

    hidden_size: int
    n_heads: int
    use_bias: bool
    dropout: float
    n_layers_fixup: Optional[int] = None
    attn_impl: str = "pallas"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, context, mask=None, deterministic: bool = True):
        h, fan = self.hidden_size, self.hidden_size
        fix = self.n_layers_fixup
        v_init = (fixup_scaled_init(fix, value=True) if fix
                  else torch_linear_init())
        q = _dense(h, fan, self.use_bias, name="query", dtype=self.dtype)(x)
        if tp_mesh_active():
            k = _dense(h, fan, self.use_bias, name="key",
                       dtype=self.dtype)(context)
            v = _dense(h, fan, self.use_bias, kernel_init=v_init,
                       name="value", dtype=self.dtype)(context)
        else:
            # k/v share the context input -> one (fan, 2H) GEMM
            projs = [
                _ProjParams(h, fan, self.use_bias, torch_linear_init(),
                            name="key")(),
                _ProjParams(h, fan, self.use_bias, v_init, name="value")(),
            ]
            k, v = _fused_proj(context, projs, self.dtype)
        drop_rate = 0.0 if deterministic else self.dropout
        drop_key = (self.make_rng("dropout")
                    if drop_rate > 0.0 else None)
        out = _attn_call(q, k, v, self.n_heads, mask, drop_rate, drop_key,
                         self.attn_impl)
        out = ReplayDropout(self.dropout)(out, deterministic=deterministic)
        return _dense(h, fan, self.use_bias,
                      kernel_init=(fixup_scaled_init(fix) if fix
                                   else torch_linear_init()),
                      name="out_proj", dtype=self.dtype)(out)


def _norm(cfg, name: str, dtype: Dtype):
    from ..ops.layernorm import FusedLayerNorm

    if cfg.use_scalenorm:
        return ScaleNorm(cfg.hidden_size ** 0.5, name=name, dtype=dtype)
    # epsilon matches torch nn.LayerNorm (1e-5); flax defaults to 1e-6.
    # FusedLayerNorm = nn.LayerNorm twin (same param tree/math; runs the
    # XLA form by default — the Pallas modes measured slower in situ,
    # see ops/layernorm.py PALLAS_LAYERNORM)
    return FusedLayerNorm(epsilon=1e-5, name=name, dtype=dtype)


class EncoderLayer(nn.Module):
    """Pre-norm residual block: x + attn(ln(x)); x + mlp(ln(x))
    (``encoder_embeddings.py:91-116``)."""

    cfg: Any            # transformer config node
    attn_impl: str = "pallas"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        cfg = self.cfg
        fix = cfg.n_layers if cfg.fixup_init else None
        x = x + Attention(cfg.hidden_size, cfg.n_heads, cfg.attention_bias,
                          cfg.dropout, n_layers_fixup=fix,
                          attn_impl=self.attn_impl, name="attn",
                          dtype=self.dtype)(
            _norm(cfg, "ln1", self.dtype)(x), mask, deterministic)
        x = x + MLP(cfg.hidden_size, cfg.inter_size, cfg.act, cfg.mlp_bias,
                    cfg.dropout, n_layers_fixup=fix, name="mlp",
                    dtype=self.dtype)(
            _norm(cfg, "ln2", self.dtype)(x), deterministic)
        return x


class DecoderLayer(nn.Module):
    """Self-attn + cross-attn + MLP residual block
    (``decoder_embeddings.py:112-147``)."""

    cfg: Any
    attn_impl: str = "pallas"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, context, sa_mask=None, xa_mask=None,
                 deterministic: bool = True):
        cfg = self.cfg
        fix = cfg.n_layers if cfg.fixup_init else None
        x = x + Attention(cfg.hidden_size, cfg.n_heads, cfg.attention_bias,
                          cfg.dropout, n_layers_fixup=fix,
                          attn_impl=self.attn_impl, name="attn",
                          dtype=self.dtype)(
            _norm(cfg, "ln1", self.dtype)(x), sa_mask, deterministic)
        x = x + CrossAttention(cfg.hidden_size, cfg.n_heads,
                               cfg.attention_bias, cfg.dropout,
                               n_layers_fixup=fix, attn_impl=self.attn_impl,
                               name="cross_attn", dtype=self.dtype)(
            _norm(cfg, "query_norm", self.dtype)(x),
            _norm(cfg, "context_norm", self.dtype)(context),
            xa_mask, deterministic)
        x = x + MLP(cfg.hidden_size, cfg.inter_size, cfg.act, cfg.mlp_bias,
                    cfg.dropout, n_layers_fixup=fix, name="mlp",
                    dtype=self.dtype)(
            _norm(cfg, "ln2", self.dtype)(x), deterministic)
        return x


# When True (default), MXUEmbed's backward runs as a one-hot-transpose
# GEMM on the MXU instead of XLA's scatter-add. Module-level so a bench
# can A/B both compilations within one process.
MXU_EMBED_BWD = True


@jax.custom_vjp
def _take_mxu_bwd(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(table, ids, axis=0)


def _take_mxu_bwd_fwd(table, ids):
    res = (ids, jax.ShapeDtypeStruct(table.shape, table.dtype))
    return jnp.take(table, ids, axis=0), res


def _take_mxu_bwd_bwd(res, g):
    ids, tref = res
    vocab, width = tref.shape
    gf = g.reshape(-1, width)
    onehot = jax.nn.one_hot(ids.reshape(-1), vocab, dtype=gf.dtype)
    # contract the flattened position axis: (N,vocab)^T @ (N,width).
    # HIGHEST precision + f32 accumulation keep the grad f32-accurate
    # (DEFAULT would bf16-round every g element before the sum).
    dtable = jax.lax.dot_general(
        onehot, gf, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return dtable.astype(tref.dtype), None


_take_mxu_bwd.defvjp(_take_mxu_bwd_fwd, _take_mxu_bwd_bwd)


class MXUEmbed(nn.Embed):
    """``nn.Embed`` whose gradient is a one-hot-transpose GEMM on the MXU.

    The forward is the identical gather. The default VJP is a scatter-add
    that runs at VPU scatter throughput — measured 262 us per table per
    step at B=256 on v5e (8 tables = 2.1 ms, ~3 % of the step) and
    invariant to vocab size: it is bound by the 25,600 row-updates, not
    the table. The custom backward computes ``one_hot(ids)^T @ g`` — the
    same segment-sum, at MXU rate (~1.3 GFLOP, tens of us). Rebuild of
    the torch ``nn.Embedding`` position/modality tables
    (``/root/reference/src/multi_modal/encoder_embeddings.py:44-50``);
    param tree is byte-identical to ``nn.Embed`` ('embedding')."""

    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        if not MXU_EMBED_BWD:
            return super().__call__(inputs)
        return _take_mxu_bwd(self.embedding, inputs)


class ModalityTokenizer(nn.Module):
    """Per-modality token embedding: Dense(C -> C*mult) -> act -> *scale ->
    Dense(-> H) -> dropout (token path of the reference embedding layers)."""

    n_channels: int
    hidden_size: int
    mult: int
    act: str
    scale: float
    use_bias: bool
    dropout: float
    dtype: Dtype = None

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        inter = self.n_channels * self.mult
        x = _dense(inter, self.n_channels, self.use_bias, name="token_embed",
                   dtype=self.dtype)(inputs)
        x = ACT2FN[self.act](x) * self.scale
        x = _dense(self.hidden_size, inter, True, name="projection",
                   dtype=self.dtype)(x)
        return ReplayDropout(self.dropout)(x, deterministic=deterministic)


class SessionStitchedTokenizer(nn.Module):
    """NDT2-style session stitcher: per-session input projection selected by
    a *traced* session id, then a shared projection to the trunk width.

    Multi-session support is new work in this framework (the reference's
    tokenizers are single-session ``Linear(N_ch, ...)``; its stitch sampler
    only groups same-N trials — ``loader/base.py:150-179``). TPU-first
    design: all sessions pad to one ``n_channels = N_max`` and the
    per-session kernels live in ONE ``(S, N_max, inter)`` parameter indexed
    with ``jnp.take`` — a single compiled program covers every session.
    The intermediate width is ``mult * hidden_size`` (session-independent),
    where the single-session tokenizer uses ``mult * N_ch``.
    """

    n_sessions: int
    n_channels: int
    hidden_size: int
    mult: int
    act: str
    scale: float
    use_bias: bool
    dropout: float
    dtype: Dtype = None

    @nn.compact
    def __call__(self, inputs, session_id, deterministic: bool = True):
        inter = self.mult * self.hidden_size
        S, N = self.n_sessions, self.n_channels

        def kernel_init(key, shape, dtype=jnp.float32):
            bound = 1.0 / np.sqrt(N)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        W = self.param("token_embed_kernel", kernel_init, (S, N, inter))
        b = self.param("token_embed_bias", kernel_init, (S, inter)) \
            if self.use_bias else None
        # width-bucketed inputs (train/multisession.py): a session whose
        # bucket pads to N_in < N_max runs the SAME math on a static slice
        # of the stitched kernel — input columns past a session's real
        # neuron count are zero-padded, so rows [n_real:] of its kernel
        # never contribute; slicing to the bucket width just stops paying
        # gather bytes + GEMM FLOPs for them (forward is bit-identical,
        # tests/test_multisession.py width-invariance).
        n_in = inputs.shape[-1]
        assert n_in <= N, f"input width {n_in} exceeds stitched width {N}"
        W_in = W[:, :n_in, :] if n_in < N else W
        # scalar id: one shared (N, inter) kernel — plain GEMM. (B,) ids
        # (session-mixed batches): (B, N, inter) gather + batched GEMM —
        # the MXU runs B independent (T,N)x(N,inter) contractions.
        w_s = jnp.take(W_in, session_id, axis=0).astype(
            self.dtype or inputs.dtype)
        x = inputs @ w_s
        if b is not None:
            b_s = jnp.take(b, session_id, axis=0).astype(x.dtype)
            x = x + (b_s[:, None, :] if b_s.ndim == 2 else b_s)
        x = ACT2FN[self.act](x) * self.scale
        x = _dense(self.hidden_size, inter, True, name="projection",
                   dtype=self.dtype)(x)
        return ReplayDropout(self.dropout)(x, deterministic=deterministic)


class SessionStitchedHead(nn.Module):
    """Per-session output projection ``(H -> N_max)`` indexed by a traced
    session id — the decoder-side half of session stitching."""

    n_sessions: int
    n_channels: int
    hidden_size: int

    @nn.compact
    def __call__(self, y, session_id, n_out: Optional[int] = None):
        S, H, N = self.n_sessions, self.hidden_size, self.n_channels

        def kernel_init(key, shape, dtype=jnp.float32):
            bound = 1.0 / np.sqrt(H)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        W = self.param("kernel", kernel_init, (S, H, N))
        b = self.param("bias", kernel_init, (S, N))
        if n_out is not None and n_out < N:
            # width-bucketed batch: predictions only for the bucket's
            # channels (static slice — columns past every in-bucket
            # session's real width carry no loss anyway)
            W, b = W[:, :, :n_out], b[:, :n_out]
        w_s = jnp.take(W, session_id, axis=0).astype(y.dtype)
        b_s = jnp.take(b, session_id, axis=0).astype(y.dtype)
        return y @ w_s + (b_s[:, None, :] if b_s.ndim == 2 else b_s)


class FactorsProjection(nn.Module):
    """Optional bottleneck head (``mm_utils.py:55-73``); kept for API parity
    — not constructed in the live model path, mirroring the reference."""

    hidden_size: int
    size: int
    act: str = "relu"
    use_bias: bool = True
    dropout: float = 0.0
    active: bool = True
    init_range: float = 0.02
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = ReplayDropout(self.dropout)(x, deterministic=deterministic)
        if not self.active:
            return x
        x = nn.Dense(
            self.size, use_bias=self.use_bias,
            kernel_init=nn.initializers.uniform(scale=2 * self.init_range),
            bias_init=nn.initializers.zeros,
            name="proj", dtype=self.dtype)(x)
        return ACT2FN[self.act](x)
