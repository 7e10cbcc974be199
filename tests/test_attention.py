"""Attention kernel tests: Pallas (interpret mode on CPU) vs XLA oracle,
gradients through the custom VJP, mask/bias semantics, context mask banding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_foundation_model_tpu.ops import (
    create_context_mask,
    mask_to_bias,
    multi_head_attention,
)

B, T, H, HEADS = 2, 10, 16, 4


@pytest.fixture
def qkv(rng):
    q = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    return q, k, v


def test_pallas_matches_xla_no_mask(qkv):
    q, k, v = qkv
    out_p = multi_head_attention(q, k, v, HEADS, impl="pallas")
    out_x = multi_head_attention(q, k, v, HEADS, impl="xla")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=1e-5, rtol=1e-5)


def test_pallas_matches_xla_with_mask(qkv, rng):
    q, k, v = qkv
    mask = jnp.asarray(rng.integers(0, 2, size=(B, T, T)))
    mask = mask.at[:, :, 0].set(1)  # no fully-masked rows
    out_p = multi_head_attention(q, k, v, HEADS, mask=mask, impl="pallas")
    out_x = multi_head_attention(q, k, v, HEADS, mask=mask, impl="xla")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=1e-5, rtol=1e-5)


def test_cross_attention_different_lengths(rng):
    M = 7
    q = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, M, H)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, M, H)).astype(np.float32))
    mask = jnp.ones((B, T, M), jnp.int32)
    out_p = multi_head_attention(q, k, v, HEADS, mask=mask, impl="pallas")
    out_x = multi_head_attention(q, k, v, HEADS, mask=mask, impl="xla")
    assert out_p.shape == (B, T, H)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=1e-5, rtol=1e-5)


def test_masked_keys_have_no_influence(qkv):
    q, k, v = qkv
    mask = jnp.ones((B, T, T), jnp.int32).at[:, :, T - 1].set(0)
    out1 = multi_head_attention(q, k, v, HEADS, mask=mask, impl="pallas")
    # perturb the masked key/value — output must not change
    k2 = k.at[:, T - 1].set(99.0)
    v2 = v.at[:, T - 1].set(-99.0)
    out2 = multi_head_attention(q, k2, v2, HEADS, mask=mask, impl="pallas")
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_xla(qkv):
    q, k, v = qkv
    mask = jnp.ones((B, T, T), jnp.int32)

    def loss(impl):
        def f(q, k, v):
            out = multi_head_attention(q, k, v, HEADS, mask=mask, impl=impl)
            return jnp.sum(out ** 2)
        return f

    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_fully_masked_row_is_finite(qkv):
    q, k, v = qkv
    mask = jnp.ones((B, T, T), jnp.int32).at[0].set(0)  # trial 0 fully masked
    out = multi_head_attention(q, k, v, HEADS, mask=mask, impl="pallas")
    assert np.isfinite(np.asarray(out)).all()
    g = jax.grad(lambda q: jnp.sum(multi_head_attention(
        q, k, v, HEADS, mask=mask, impl="pallas")))(q)
    assert np.isfinite(np.asarray(g)).all()


def test_dropout_zero_is_deterministic(qkv):
    q, k, v = qkv
    key = jax.random.PRNGKey(0)
    out1 = multi_head_attention(q, k, v, HEADS, dropout_rate=0.5,
                                dropout_key=key, impl="xla")
    out2 = multi_head_attention(q, k, v, HEADS, dropout_rate=0.5,
                                dropout_key=key, impl="xla")
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = multi_head_attention(q, k, v, HEADS, dropout_rate=0.5,
                                dropout_key=jax.random.PRNGKey(1), impl="xla")
    assert not np.array_equal(np.asarray(out1), np.asarray(out3))


def test_dropout_mean_preserving(rng):
    # with constant values, attention output is v regardless of dropout mask
    # scaling; check dropout keeps the output in a sane range (xla path)
    q = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))
    v = jnp.ones((B, T, H), jnp.float32)
    out = multi_head_attention(q, k, v, HEADS, dropout_rate=0.3,
                               dropout_key=jax.random.PRNGKey(0), impl="xla")
    assert 0.2 < float(np.asarray(out).mean()) < 3.0


def test_context_mask_banding():
    m = np.asarray(create_context_mask(-1, -1, 5))
    np.testing.assert_array_equal(m, np.ones((5, 5)))
    causal = np.asarray(create_context_mask(0, -1, 5))
    np.testing.assert_array_equal(causal, np.tril(np.ones((5, 5))))
    windowed = np.asarray(create_context_mask(1, 1, 4))
    want = np.array([[1, 1, 0, 0],
                     [1, 1, 1, 0],
                     [0, 1, 1, 1],
                     [0, 0, 1, 1]])
    np.testing.assert_array_equal(windowed, want)


def test_mask_to_bias():
    b = np.asarray(mask_to_bias(jnp.asarray([[1, 0]])))
    assert b[0, 0] == 0.0
    assert b[0, 1] < -1e29


def test_bfloat16_inputs(qkv):
    q, k, v = (x.astype(jnp.bfloat16) for x in qkv)
    out = multi_head_attention(q, k, v, HEADS, impl="pallas")
    assert out.dtype == jnp.bfloat16
    out_x = multi_head_attention(q, k, v, HEADS, impl="xla")
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(out_x, np.float32),
        atol=3e-2, rtol=3e-2)


# ---------------------------------------------------------------------------
# MaskSpec (key_pad + static decomposition) — the fused-kernel-native form
# ---------------------------------------------------------------------------

def test_maskspec_matches_full_mask(qkv, rng):
    """pallas with (key_pad, static) == xla with the composed full mask."""
    from multi_modal_foundation_model_tpu.ops.attention import MaskSpec
    q, k, v = qkv
    key_pad = jnp.asarray(rng.integers(0, 2, size=(B, T)), jnp.int32)
    static = jnp.eye(T, dtype=jnp.int32)
    spec = MaskSpec(key_pad=key_pad, static=static)
    full = (static[None].astype(bool)
            | key_pad.astype(bool)[:, None, :]).astype(jnp.int32)
    out_p = multi_head_attention(q, k, v, HEADS, mask_spec=spec,
                                 impl="pallas")
    out_x = multi_head_attention(q, k, v, HEADS, mask=full, impl="xla")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-3, atol=2e-3)


def test_maskspec_static_only_and_pad_only(qkv):
    from multi_modal_foundation_model_tpu.ops.attention import MaskSpec
    q, k, v = qkv
    causal = jnp.tril(jnp.ones((T, T), jnp.int32))
    out_p = multi_head_attention(q, k, v, HEADS,
                                 mask_spec=MaskSpec(static=causal),
                                 impl="pallas")
    out_x = multi_head_attention(
        q, k, v, HEADS, mask=jnp.broadcast_to(causal[None], (B, T, T)),
        impl="xla")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-3, atol=2e-3)

    pad = jnp.ones((B, T), jnp.int32).at[:, T - 2:].set(0)
    out_p2 = multi_head_attention(q, k, v, HEADS,
                                  mask_spec=MaskSpec(key_pad=pad),
                                  impl="pallas")
    out_x2 = multi_head_attention(
        q, k, v, HEADS,
        mask=jnp.broadcast_to(pad[:, None, :], (B, T, T)), impl="xla")
    np.testing.assert_allclose(np.asarray(out_p2), np.asarray(out_x2),
                               rtol=2e-3, atol=2e-3)


def test_maskspec_gradients_match_xla(qkv):
    from multi_modal_foundation_model_tpu.ops.attention import MaskSpec
    q, k, v = qkv
    pad = jnp.ones((B, T), jnp.int32)
    spec = MaskSpec(key_pad=pad, static=jnp.eye(T, dtype=jnp.int32))
    full = (jnp.eye(T, dtype=bool)[None]
            | pad.astype(bool)[:, None, :]).astype(jnp.int32)

    def loss_p(q):
        return multi_head_attention(q, k, v, HEADS, mask_spec=spec,
                                    impl="pallas").sum()

    def loss_x(q):
        return multi_head_attention(q, k, v, HEADS, mask=full,
                                    impl="xla").sum()

    g_p = jax.grad(loss_p)(q)
    g_x = jax.grad(loss_x)(q)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=5e-3, atol=5e-3)


def test_maskspec_dropout_custom_vjp_runs(qkv):
    """Dropout>0 through the kernel's custom VJP: finite grads, and the
    regenerated backward dropout mask yields the exact zero-pattern match
    (a wrong mask would leak gradient into dropped positions)."""
    from multi_modal_foundation_model_tpu.ops.attention import MaskSpec
    q, k, v = qkv
    spec = MaskSpec(key_pad=jnp.ones((B, T), jnp.int32))
    key = jax.random.PRNGKey(3)

    def loss(q):
        return multi_head_attention(q, k, v, HEADS, mask_spec=spec,
                                    dropout_rate=0.5, dropout_key=key,
                                    impl="pallas").sum()

    g = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(g)).all()


def test_saved_lse_matches_recompute(qkv):
    """The backward's saved-LSE path (exp(s - lse) from the forward's
    sidecar) must match the in-kernel softmax recompute to f32 rounding
    on every row with at least one attendable key; guards the
    _BWD_USE_SAVED_LSE A/B flag against rot. On hardware the two were
    additionally measured grad-equal to ~1e-3 relative — 10x below the
    shared bf16-MXU truncation error vs the oracle (RESULTS.md round 3).

    Batch element 0 has ALL keys masked: the clamped-fold sidecar
    (``max(m, _LSE_FLOOR) + log(l)``) makes such rows contribute ZERO
    gradient through the saved path (a raw m+log(l) fold would be
    absorbed to m in f32 and silently give them probability 1 — a
    Tk-fold gradient error; the recompute path gives the uniform 1/Tk
    flow, which leaks gradient into fully-padded positions)."""
    import multi_modal_foundation_model_tpu.ops.attention as attention
    q, k, v = qkv
    pad = jnp.ones((B, T), jnp.int32).at[:, T - 3:].set(0).at[0, :].set(0)
    spec = attention.MaskSpec(key_pad=pad)

    def loss(q, k, v):
        return jnp.sum(multi_head_attention(
            q, k, v, HEADS, mask_spec=spec, impl="pallas") ** 2)

    grads = {}
    saved_flag = attention._BWD_USE_SAVED_LSE
    try:
        for saved in (True, False):
            attention._BWD_USE_SAVED_LSE = saved
            grads[saved] = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        attention._BWD_USE_SAVED_LSE = saved_flag
    for a, b in zip(grads[True], grads[False]):
        # rows with attendable keys: identical to f32 rounding
        np.testing.assert_allclose(np.asarray(a)[1:], np.asarray(b)[1:],
                                   rtol=1e-4, atol=1e-5)
        # fully-masked batch element: zero gradient through the saved path
        np.testing.assert_array_equal(np.asarray(a)[0],
                                      np.zeros_like(np.asarray(a)[0]))

def test_softmax_base2_matches_base_e(qkv):
    """_SOFTMAX_BASE2 A/B flag: exp2 with log2(e) folded into the q
    pre-scale is the same math as exp (exp2(x*log2e) == exp(x)), so the
    two compiles must agree — forward to f32 rounding, and gradients
    through the saved-(base-2)-LSE backward incl. the dk fold-correction
    (ln2) and a fully-masked batch element's zero-grad contract."""
    import multi_modal_foundation_model_tpu.ops.attention as attention
    q, k, v = qkv
    pad = jnp.ones((B, T), jnp.int32).at[:, T - 3:].set(0).at[0, :].set(0)
    spec = attention.MaskSpec(key_pad=pad)

    def loss(q, k, v):
        return jnp.sum(multi_head_attention(
            q, k, v, HEADS, mask_spec=spec, impl="pallas") ** 2)

    outs, grads = {}, {}
    flag = attention._SOFTMAX_BASE2
    try:
        for base2 in (True, False):
            attention._SOFTMAX_BASE2 = base2
            outs[base2] = multi_head_attention(
                q, k, v, HEADS, mask_spec=spec, impl="pallas")
            grads[base2] = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        attention._SOFTMAX_BASE2 = flag
    np.testing.assert_allclose(np.asarray(outs[True]),
                               np.asarray(outs[False]),
                               rtol=1e-5, atol=1e-6)
    for a, b in zip(grads[True], grads[False]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(a)[0],
                                      np.zeros_like(np.asarray(a)[0]))
