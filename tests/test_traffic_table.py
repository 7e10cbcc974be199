"""Offline checks for the HBM traffic-table tool (scripts/traffic_table.py).

Compiles a tiny train step on the CPU backend and validates that the HLO
walker parses every ENTRY instruction, attributes plausible byte counts,
and that the shape parser honors TPU tiling. New observability the
reference has no analog for (SURVEY.md §5).
"""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from traffic_table import _one_shape_bytes, shape_bytes, walk_entry  # noqa: E402


def test_shape_bytes_tiling():
    # untiled: plain product
    assert _one_shape_bytes("f32", "4,4", None) == 64
    # TPU-tiled layout pads the two minor dims to (8, 128)
    assert _one_shape_bytes("f32", "4,4", "1,0:T(8,128)") == 8 * 128 * 4
    assert _one_shape_bytes("bf16", "256,100,668", "") == 256 * 100 * 668 * 2
    # tuple shapes sum their leaves
    assert shape_bytes("(f32[8]{0}, s32[2]{0})") == 8 * 4 + 2 * 4
    # token / opaque elements contribute nothing
    assert shape_bytes("token[]") == 0


def test_walk_entry_on_compiled_step():
    from bench import _build

    state, train_step, spikes, behavior = _build(8, 20, 64)
    k = jax.random.PRNGKey(0)
    compiled = (jax.jit(train_step)
                .lower(state, spikes, behavior, k).compile())
    rows = walk_entry(compiled.as_text())
    assert len(rows) > 10, "walker found almost no ENTRY instructions"

    total = sum(r["out_bytes"] + r["in_bytes"] for r in rows)
    assert total > 0
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    ca = float(cost.get("bytes accessed", 0.0))
    if ca > 0:
        # same accounting model as cost_analysis — totals must agree to
        # well within an order of magnitude (walker double-counts operands
        # a fusion recomputes; cost_analysis may model in-place updates)
        assert 0.2 < total / ca < 5.0, (total, ca)

    classes = {r["class"] for r in rows}
    assert any(c.startswith("fusion") or c == "bare matmul"
               for c in classes), classes
    for r in rows:
        assert r["out_bytes"] >= 0 and r["in_bytes"] >= 0
