"""Fused Pallas LayerNorm (ops/layernorm.py) vs flax nn.LayerNorm.

The XLA fallback form must be BIT-identical to nn.LayerNorm (it is what
every CPU test and the reference-parity suite run through); the Pallas
kernels (interpret mode here) must match it in forward and all three
gradients. Shapes cover the model's sites: bf16 trunk pre-norms with f32
params, f32 final norms, and a non-multiple-of-block token count (padding
path, dgamma/dbeta leak guard)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_modal_foundation_model_tpu.ops.layernorm import (
    FusedLayerNorm, _bwdonly_layernorm, _pallas_layernorm, _xla_layernorm)


def _mk(dtype, B=4, T=50, H=256, seed=0):
    x = jax.random.normal(jax.random.PRNGKey(seed), (B, T, H),
                          jnp.float32) * 2.0 + 0.3
    return x.astype(dtype)


@pytest.mark.parametrize("dtype,ln_dtype,gtol", [
    (jnp.float32, None, 1e-5),
    (jnp.bfloat16, jnp.bfloat16, 2e-2),   # dx rounds to bf16: 1-ulp noise
])
def test_xla_form_matches_flax_layernorm(dtype, ln_dtype, gtol):
    x = _mk(dtype)
    ref = nn.LayerNorm(epsilon=1e-5, dtype=ln_dtype)
    p = ref.init(jax.random.PRNGKey(1), x)
    scale = p["params"]["scale"] * 1.3 + 0.1
    bias = p["params"]["bias"] + 0.2
    p = {"params": {"scale": scale, "bias": bias}}

    y_ref = ref.apply(p, x)
    y = _xla_layernorm(x, scale, bias, 1e-5, ln_dtype)
    assert y.dtype == y_ref.dtype
    np.testing.assert_array_equal(np.asarray(y, np.float32),
                                  np.asarray(y_ref, np.float32))

    def loss_ref(s, b, xx):
        return jnp.sum(jnp.sin(ref.apply(
            {"params": {"scale": s, "bias": b}}, xx).astype(jnp.float32)))

    def loss_new(s, b, xx):
        return jnp.sum(jnp.sin(_xla_layernorm(
            xx, s, b, 1e-5, ln_dtype).astype(jnp.float32)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(scale, bias, x)
    g_new = jax.grad(loss_new, argnums=(0, 1, 2))(scale, bias, x)
    # forward is bit-identical; grads only to autodiff association order
    # (and to the grad dtype's own rounding: dx is bf16 for bf16 inputs)
    for a, b_ in zip(g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   rtol=1e-4, atol=gtol)


@pytest.mark.parametrize("dtype,out_dtype,tol", [
    (jnp.float32, jnp.float32, 2e-5),
    (jnp.bfloat16, jnp.bfloat16, 2e-2),
])
@pytest.mark.parametrize("T", [50, 37])   # 37*4 tokens: padding path
def test_pallas_kernels_match_xla_form(dtype, out_dtype, tol, T):
    x = _mk(dtype, T=T)
    H = x.shape[-1]
    scale = (jax.random.normal(jax.random.PRNGKey(2), (H,)) * 0.2 + 1.0)
    bias = jax.random.normal(jax.random.PRNGKey(3), (H,)) * 0.1

    y_ref = _xla_layernorm(x, scale, bias, 1e-5, out_dtype)
    y = _pallas_layernorm(x, scale, bias, 1e-5, out_dtype)
    assert y.dtype == y_ref.dtype and y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               rtol=tol, atol=tol)

    def mk_loss(fn):
        def loss(xx, s, b):
            return jnp.sum(jnp.sin(fn(xx, s, b).astype(jnp.float32)))
        return loss

    g_new = jax.grad(mk_loss(
        lambda xx, s, b: _pallas_layernorm(xx, s, b, 1e-5, out_dtype)),
        argnums=(0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(mk_loss(
        lambda xx, s, b: _xla_layernorm(xx, s, b, 1e-5, out_dtype)),
        argnums=(0, 1, 2))(x, scale, bias)
    names = ("dx", "dscale", "dbias")
    for n, a, b_ in zip(names, g_new, g_ref):
        assert a.dtype == b_.dtype, n
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   rtol=tol, atol=tol, err_msg=n)


@pytest.mark.parametrize("dtype,out_dtype,tol", [
    (jnp.float32, jnp.float32, 2e-5),
    (jnp.bfloat16, jnp.bfloat16, 2e-2),
])
def test_bwdonly_variant_matches_xla(dtype, out_dtype, tol):
    """the production mode ('bwd'): XLA forward bit-identical, Pallas
    backward matches the XLA VJP."""
    x = _mk(dtype, T=37)
    H = x.shape[-1]
    scale = (jax.random.normal(jax.random.PRNGKey(2), (H,)) * 0.2 + 1.0)
    bias = jax.random.normal(jax.random.PRNGKey(3), (H,)) * 0.1

    y = _bwdonly_layernorm(x, scale, bias, 1e-5, out_dtype)
    y_ref = _xla_layernorm(x, scale, bias, 1e-5, out_dtype)
    np.testing.assert_array_equal(np.asarray(y, np.float32),
                                  np.asarray(y_ref, np.float32))

    def mk_loss(fn):
        return lambda xx, s, b: jnp.sum(jnp.sin(
            fn(xx, s, b).astype(jnp.float32)))

    g_new = jax.grad(mk_loss(
        lambda xx, s, b: _bwdonly_layernorm(xx, s, b, 1e-5, out_dtype)),
        argnums=(0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(mk_loss(
        lambda xx, s, b: _xla_layernorm(xx, s, b, 1e-5, out_dtype)),
        argnums=(0, 1, 2))(x, scale, bias)
    for n, a, b_ in zip(("dx", "dscale", "dbias"), g_new, g_ref):
        assert a.dtype == b_.dtype, n
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   rtol=tol, atol=tol, err_msg=n)


def test_pallas_kernels_multiblock_grid(monkeypatch):
    """grid > 1 (more tokens than one block): the dgamma/dbeta outputs
    are a single (1, H) block accumulated across sequential grid steps —
    regression for the Mosaic block-shape rejection of (1, H) blocks
    over a (grid, H) array."""
    import multi_modal_foundation_model_tpu.ops.layernorm as lnmod
    monkeypatch.setattr(lnmod, "_BM", 64)
    x = _mk(jnp.float32, B=4, T=50)     # 200 tokens -> grid > 3, padded
    H = x.shape[-1]
    scale = (jax.random.normal(jax.random.PRNGKey(2), (H,)) * 0.2 + 1.0)
    bias = jax.random.normal(jax.random.PRNGKey(3), (H,)) * 0.1

    def mk_loss(fn):
        return lambda xx, s, b: jnp.sum(jnp.sin(fn(xx, s, b)))

    y = _pallas_layernorm(x, scale, bias, 1e-5, jnp.float32)
    y_ref = _xla_layernorm(x, scale, bias, 1e-5, jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
    g_new = jax.grad(mk_loss(
        lambda xx, s, b: _pallas_layernorm(xx, s, b, 1e-5, jnp.float32)),
        argnums=(0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(mk_loss(
        lambda xx, s, b: _xla_layernorm(xx, s, b, 1e-5, jnp.float32)),
        argnums=(0, 1, 2))(x, scale, bias)
    for n, a, b_ in zip(("dx", "dscale", "dbias"), g_new, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=2e-5, err_msg=n)


def test_fused_layernorm_module_param_tree():
    """FusedLayerNorm mirrors nn.LayerNorm's param tree (checkpoint /
    torch-converter compatibility) and matches its output on the XLA
    path (non-TPU backends always take it)."""
    x = _mk(jnp.float32, T=10)
    ref, new = nn.LayerNorm(epsilon=1e-5), FusedLayerNorm(epsilon=1e-5)
    p_ref = ref.init(jax.random.PRNGKey(0), x)
    p_new = new.init(jax.random.PRNGKey(0), x)
    jax.tree.map(np.testing.assert_array_equal, p_ref, p_new)
    np.testing.assert_array_equal(np.asarray(ref.apply(p_ref, x)),
                                  np.asarray(new.apply(p_new, x)))
