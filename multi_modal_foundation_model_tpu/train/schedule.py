"""Optimizer + LR schedule construction (optax).

Parity with the reference optimizer setup
(``/root/reference/src/train_multi_modal.py:196-209``):

- ``torch.optim.AdamW(lr, weight_decay, eps)``  ->  ``optax.adamw``
- ``torch.optim.lr_scheduler.OneCycleLR(total_steps, max_lr, pct_start,
  div_factor)``  ->  ``optax.cosine_onecycle_schedule`` (identical math:
  cosine anneal from ``max_lr/div_factor`` up over ``pct_start`` of the run,
  then down to ``max_lr/final_div_factor``; torch's default
  ``final_div_factor=1e4`` is also optax's default).

Defaults mirror ``configs/multi_modal/trainer_mm.yaml:116-123``
(lr 1e-4, wd 0.01, eps 1e-8, warmup_pct 0.15, div_factor 10).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 1.0e-4
    wd: float = 0.01
    eps: float = 1.0e-8
    warmup_pct: float = 0.15
    div_factor: float = 10.0
    final_div_factor: float = 1.0e4
    scheduler: str = "cosine"          # "cosine" (OneCycle) | "constant"
    # torch OneCycleLR cycles beta1 inversely to the LR by default
    # (cycle_momentum=True, 0.95 -> 0.85 -> 0.95); the reference constructs
    # OneCycleLR with defaults, so this is part of optimizer parity
    cycle_momentum: bool = True
    base_momentum: float = 0.85
    max_momentum: float = 0.95
    gradient_accumulation_steps: int = 1
    max_grad_norm: Optional[float] = None

    @classmethod
    def from_config(cls, cfg) -> "OptimizerConfig":
        return cls(
            lr=float(cfg.lr),
            wd=float(cfg.wd),
            eps=float(cfg.eps),
            warmup_pct=float(cfg.get("warmup_pct", 0.15)),
            div_factor=float(cfg.get("div_factor", 10.0)),
            scheduler=str(cfg.get("scheduler", "cosine")),
            cycle_momentum=bool(cfg.get("cycle_momentum", True)),
            base_momentum=float(cfg.get("base_momentum", 0.85)),
            max_momentum=float(cfg.get("max_momentum", 0.95)),
            gradient_accumulation_steps=int(
                cfg.get("gradient_accumulation_steps", 1)),
        )


def one_cycle_schedule(cfg: OptimizerConfig, total_steps: int) -> optax.Schedule:
    """Torch-exact OneCycleLR (cosine, two-phase).

    torch anneals up over ``pct_start*total_steps - 1`` steps and down over
    the remainder (``torch/optim/lr_scheduler.py`` OneCycleLR); optax's
    ``cosine_onecycle_schedule`` uses ``pct_start*total_steps``, a one-step
    phase shift. Implemented directly so LR traces match the reference run
    step-for-step.
    """
    if cfg.scheduler == "constant" or total_steps <= 1:
        return optax.constant_schedule(cfg.lr)

    initial_lr = cfg.lr / cfg.div_factor
    min_lr = initial_lr / cfg.final_div_factor
    step_size_up = max(cfg.warmup_pct * total_steps - 1.0, 1.0)
    step_size_down = max(total_steps - step_size_up - 1.0, 1.0)

    def _cos(start, end, pct):
        return end + (start - end) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))

    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        up = _cos(initial_lr, cfg.lr, t / step_size_up)
        down = _cos(cfg.lr, min_lr, (t - step_size_up) / step_size_down)
        return jnp.where(t <= step_size_up, up, down)

    return schedule


def one_cycle_momentum_schedule(cfg: OptimizerConfig,
                                total_steps: int) -> optax.Schedule:
    """Torch-exact OneCycleLR beta1 cycling: max_momentum at the start,
    cosine down to base_momentum at the LR peak, cosine back up to
    max_momentum at the end (inverse phase of the LR; torch
    ``OneCycleLR`` with ``cycle_momentum=True`` on Adam-family betas)."""
    if cfg.scheduler == "constant" or total_steps <= 1:
        return optax.constant_schedule(0.9)       # torch AdamW default b1

    step_size_up = max(cfg.warmup_pct * total_steps - 1.0, 1.0)
    step_size_down = max(total_steps - step_size_up - 1.0, 1.0)

    def _cos(start, end, pct):
        return end + (start - end) / 2.0 * (1.0 + jnp.cos(jnp.pi * pct))

    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        up = _cos(cfg.max_momentum, cfg.base_momentum, t / step_size_up)
        down = _cos(cfg.base_momentum, cfg.max_momentum,
                    (t - step_size_up) / step_size_down)
        return jnp.where(t <= step_size_up, up, down)

    return schedule


def make_optimizer(cfg: OptimizerConfig, total_steps: int
                   ) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """AdamW + OneCycle; returns (tx, schedule) so callers can log the LR."""
    schedule = one_cycle_schedule(cfg, total_steps)
    if cfg.cycle_momentum and cfg.scheduler == "cosine" and total_steps > 1:
        b1 = one_cycle_momentum_schedule(cfg, total_steps)
        tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=schedule, b1=b1, b2=0.999,
            eps=cfg.eps, weight_decay=cfg.wd)
    else:
        tx = optax.adamw(learning_rate=schedule, b1=0.9, b2=0.999,
                         eps=cfg.eps, weight_decay=cfg.wd)
    if cfg.max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), tx)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx, schedule
