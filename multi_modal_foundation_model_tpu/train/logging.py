"""Metric logging: JSONL always, wandb when available and enabled.

The reference logs scalars + figures to wandb
(``/root/reference/src/trainer/base.py:130-173``). wandb is optional here
(not installed in every environment); the JSONL file is the durable record
either way.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class MetricLogger:
    def __init__(self, log_dir: str, use_wandb: bool = False,
                 wandb_project: Optional[str] = None,
                 wandb_run_name: Optional[str] = None,
                 config: Optional[Dict[str, Any]] = None,
                 stdout: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self.stdout = stdout
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=wandb_project or "multi_modal_foundation_model_tpu",
                           name=wandb_run_name, config=config or {})
            except ImportError:
                self._wandb = None

    def log(self, row: Dict[str, Any]) -> None:
        row = {k: _scalar(v) for k, v in row.items() if _loggable(v)}
        row.setdefault("ts", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(row) + "\n")
        if self.stdout and "epoch" in row:
            keys = [k for k in ("epoch", "train_loss", "eval_loss",
                                "eval_trial_avg_r2") if k in row]
            print(" ".join(f"{k}={row[k]:.6g}" if isinstance(row[k], float)
                           else f"{k}={row[k]}" for k in keys), flush=True)
        if self._wandb is not None:
            self._wandb.log(row)

    def log_figures(self, figs: Dict[str, Any],
                    extra: Optional[Dict[str, Any]] = None) -> None:
        """wandb.Image logging of matplotlib figures (reference
        ``trainer/base.py:130-167``); no-op without wandb — the trainer
        saves the same figures to disk either way."""
        if self._wandb is None:
            return
        row: Dict[str, Any] = dict(extra or {})
        row.update({k: self._wandb.Image(fig) for k, fig in figs.items()})
        self._wandb.log(row)

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()


def _loggable(v) -> bool:
    if isinstance(v, dict):
        return all(_loggable(x) for x in v.values())
    return isinstance(v, (int, float, str, bool)) or hasattr(v, "item")


def _scalar(v):
    if isinstance(v, dict):
        return {k: _scalar(x) for k, x in v.items()}
    if hasattr(v, "item") and not isinstance(v, (int, float, str, bool)):
        try:
            return v.item()
        except Exception:
            return str(v)
    return v
