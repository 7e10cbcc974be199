"""Unit tests for the HBM-traffic tooling (scripts/traffic_table.py):
tile-padded shape-byte accounting, op classification, and the ENTRY
walker over a real compiled-CPU HLO module."""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

import traffic_table as tt


def test_shape_bytes_tile_padding():
    # untiled: logical bytes
    assert tt.shape_bytes("f32[4,10]") == 4 * 10 * 4
    # T(8,128): both minor dims pad up
    assert tt.shape_bytes("f32[4,10]{1,0:T(8,128)}") == 8 * 128 * 4
    assert tt.shape_bytes("f32[256,100,668]{0,2,1:T(8,128)}") \
        == 256 * 104 * 768 * 4
    # bf16 halves the element size
    assert tt.shape_bytes("bf16[8,128]{1,0:T(8,128)}") == 8 * 128 * 2
    # tuple shapes sum their members
    two = tt.shape_bytes("(f32[8,128]{1,0:T(8,128)}, f32[8,128]{1,0:T(8,128)})")
    assert two == 2 * 8 * 128 * 4
    # token / unknown dtypes contribute nothing
    assert tt.shape_bytes("token[]") == 0


def test_classify():
    assert tt.classify("custom-call", "x = custom-call(...) attn_fwd") \
        == "pallas attention custom-call"
    assert tt.classify("fusion", "f = fusion(...), kind=kOutput, calls=dot3") \
        == "fusion:Output (matmul)"
    assert tt.classify("fusion", "f = fusion(...), kind=kLoop, calls=rng_b") \
        == "fusion:Loop (rng)"
    assert tt.classify("copy-start", "") == "copy"
    assert tt.classify("all-reduce", "") == "collective"
    assert tt.classify("dot", "") == "bare matmul"


def test_walk_entry_on_compiled_module():
    """The walker parses a real compiled HLO and attributes plausible
    bytes: every row has a class, outputs are positive, and a matmul
    appears for a jitted dense layer."""
    def f(x, w):
        return jnp.maximum(x @ w, 0.0).sum()

    x = jnp.ones((32, 64), jnp.float32)
    w = jnp.ones((64, 128), jnp.float32)
    hlo = jax.jit(f).lower(x, w).compile().as_text()
    rows = tt.walk_entry(hlo)
    assert rows, "walker found no instructions in ENTRY"
    assert all(r["class"] for r in rows)
    assert all(r["out_bytes"] >= 0 for r in rows)
    classes = {r["class"] for r in rows}
    assert any("matmul" in c or c == "bare matmul" for c in classes), classes
    # the dot's operand bytes include both inputs (logical, CPU untiled)
    mm = [r for r in rows if "matmul" in r["class"]]
    assert sum(r["in_bytes"] for r in mm) >= (32 * 64 + 64 * 128) * 4


def test_trace_op_times_no_trace_files(tmp_path):
    """Graceful-empty path: no profile files -> three empty maps (was a
    2-tuple unpacked as 3 at the call site)."""
    op_us, extra_us, extra_names = tt._trace_op_times(
        str(tmp_path), n_steps=5, entry_names={"fusion.1"})
    assert op_us == {} and extra_us == {} and extra_names == {}
