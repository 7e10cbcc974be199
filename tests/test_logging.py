"""MetricLogger unit tests (JSONL record semantics).

The reference logs scalars to wandb (``trainer/base.py:130-173``); here
the durable record is metrics.jsonl. Nested dicts of scalars (the
multi-session per-session metric block) must round-trip.
"""

import json

import numpy as np

from multi_modal_foundation_model_tpu.train.logging import MetricLogger


def test_metric_logger_nested_and_scalar_rows(tmp_path):
    lg = MetricLogger(str(tmp_path), stdout=False)
    lg.log({
        "epoch": 0,
        "train_loss": np.float32(1.5),
        "eval_per_session": {
            "eid-a": {"ap_bps": np.float64(0.25), "behavior_r2": 0.5},
            "eid-b": {"ap_bps": -0.1, "behavior_r2": np.float32(0.75)},
        },
        "not_loggable": object(),
        "bad_nested": {"x": object()},
    })
    rows = [json.loads(l) for l in
            (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert len(rows) == 1
    row = rows[0]
    # numpy scalars coerced to python floats, json-serializable
    assert row["train_loss"] == 1.5
    assert row["eval_per_session"]["eid-a"] == {"ap_bps": 0.25,
                                                "behavior_r2": 0.5}
    assert row["eval_per_session"]["eid-b"]["behavior_r2"] == 0.75
    # non-loggable values (flat or nested) are dropped, not crashed on
    assert "not_loggable" not in row and "bad_nested" not in row
