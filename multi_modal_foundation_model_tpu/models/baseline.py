"""Linear baseline models (flax linen).

Parity with the reference pair (SURVEY.md §2.5):

- ``BaselineEncoder`` — behavior -> spikes: one Dense over the *flattened*
  trial ``(T*C_in -> T*C_out)`` with Poisson NLL on log-rates normalized by
  batch size (``/root/reference/src/models/baseline_encoder.py:18-53``).
- ``BaselineDecoder`` — spikes -> behavior: per-timestep Dense with MSE
  normalized by batch size (``baseline_decoder.py:18-49``).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import flax.struct
import jax.numpy as jnp

from ..ops.losses import poisson_nll_elementwise
from .layers import torch_bias_init, torch_linear_init


@flax.struct.dataclass
class BaselineOutput:
    loss: jnp.ndarray
    n_examples: jnp.ndarray
    preds: jnp.ndarray
    targets: jnp.ndarray


class BaselineEncoder(nn.Module):
    """behavior -> spikes via one flattened-trial linear map."""

    in_channel: int
    out_channel: int
    seq_len: int = 100

    @nn.compact
    def __call__(self, data_dict: Dict[str, jnp.ndarray]) -> BaselineOutput:
        inputs, targets = data_dict["inputs"], data_dict["targets"]
        B, T, N = targets.shape
        fan_in = self.seq_len * self.in_channel
        flat = inputs.reshape(B, fan_in)
        preds = nn.Dense(
            self.seq_len * self.out_channel,
            kernel_init=torch_linear_init(),
            bias_init=torch_bias_init(fan_in),
            name="layer")(flat).reshape(B, T, N)
        loss = poisson_nll_elementwise(preds.astype(jnp.float32),
                                       targets.astype(jnp.float32)).sum() / B
        return BaselineOutput(loss=loss, n_examples=jnp.asarray(B),
                              preds=preds, targets=targets)


class BaselineDecoder(nn.Module):
    """spikes -> behavior via a per-timestep linear map."""

    in_channel: int
    out_channel: int

    @nn.compact
    def __call__(self, data_dict: Dict[str, jnp.ndarray]) -> BaselineOutput:
        inputs, targets = data_dict["inputs"], data_dict["targets"]
        B = targets.shape[0]
        preds = nn.Dense(
            self.out_channel,
            kernel_init=torch_linear_init(),
            bias_init=torch_bias_init(self.in_channel),
            name="layer")(inputs)
        loss = jnp.square(preds.astype(jnp.float32)
                          - targets.astype(jnp.float32)).sum() / B
        return BaselineOutput(loss=loss, n_examples=jnp.asarray(B),
                              preds=preds, targets=targets)
