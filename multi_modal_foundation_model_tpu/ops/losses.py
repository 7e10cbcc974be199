"""Masked reconstruction losses (Poisson NLL on log-rates, MSE).

Parity notes (SURVEY.md §2.1, "Poisson NLL parity"):

- The *training* loss matches ``torch.nn.PoissonNLLLoss(log_input=True,
  full=False)``: ``exp(x) - y*x`` with NO Stirling term
  (``/root/reference/src/multi_modal/mm.py:79-82``).
- The *eval* bits-per-spike uses the full NLL with ``gammaln`` — that lives
  in ``eval/metrics.py``; the two are intentionally different and must not
  be unified.

Loss normalization follows ``mm.py:217-239``: per-modality sums of masked
elementwise losses, combined as ``sum(mod_losses) / sum(mod_mask_counts)``.
These are plain jnp expressions — XLA fuses the elementwise + mask + reduce
chain into the surrounding step; no hand-written kernel is needed here.
"""

from __future__ import annotations

import jax.numpy as jnp


def poisson_nll_elementwise(log_rates: jnp.ndarray,
                            targets: jnp.ndarray) -> jnp.ndarray:
    """``exp(x) - y * x`` per element (log-input Poisson NLL, no Stirling)."""
    return jnp.exp(log_rates) - targets * log_rates


def masked_poisson_nll(log_rates: jnp.ndarray, targets: jnp.ndarray,
                       mask: jnp.ndarray):
    """(sum of masked NLL, number of masked elements)."""
    mask = mask.astype(log_rates.dtype)
    loss = (poisson_nll_elementwise(log_rates, targets) * mask).sum()
    return loss, mask.sum()


def masked_mse(preds: jnp.ndarray, targets: jnp.ndarray, mask: jnp.ndarray):
    """(sum of masked squared error, number of masked elements)."""
    mask = mask.astype(preds.dtype)
    loss = (jnp.square(preds - targets) * mask).sum()
    return loss, mask.sum()
