"""Device mesh + sharding helpers (docs/parallelism.md).

The distribution abstraction of this framework: one mesh with a ``data``
axis, parameters replicated, batches sharded on the leading (trial) axis.
XLA derives the gradient all-reduce over ICI from these placements — this
module is the entire "communication backend" (the reference's analog is HF
accelerate, constructed but never exercised; SURVEY.md §2.12).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np

P = jax.sharding.PartitionSpec


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` wrapper (idempotent, env-driven when
    args are None — the standard multi-host TPU entry)."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError:
        pass  # already initialized


def build_mesh(dp: int = -1, tp: int = 1,
               devices=None) -> Optional[jax.sharding.Mesh]:
    """Mesh over ('data',) or, when ``tp > 1``, ('data', 'model').

    ``dp=-1`` uses every device not claimed by the model axis. Returns None
    when a single device would be used (plain jit is then identical and
    cheaper). Parameter placement on the 'model' axis is governed by
    ``partition.partition_rules`` (Megatron-pattern TP); the 'data' axis
    shards the batch's leading (trial) axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    tp = max(1, tp)
    if tp > len(devices):
        raise ValueError(f"tp={tp} exceeds {len(devices)} devices")
    avail = len(devices) // tp
    n_dp = avail if dp in (-1, 0) else min(dp, avail)
    n = n_dp * tp
    if n <= 1:
        return None
    dev = np.array(devices[:n])
    if tp == 1:
        return jax.sharding.Mesh(dev, ("data",))
    return jax.sharding.Mesh(dev.reshape(n_dp, tp), ("data", "model"))


def batch_sharding(mesh: jax.sharding.Mesh) -> jax.sharding.NamedSharding:
    """Leading-axis (trial) sharding for batch arrays."""
    return jax.sharding.NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: jax.sharding.Mesh) -> jax.sharding.NamedSharding:
    return jax.sharding.NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Optional[jax.sharding.Mesh]
                ) -> Dict[str, Any]:
    """Place every array in ``batch`` with its leading axis over 'data'
    (no-op placement when mesh is None)."""
    import jax.numpy as jnp

    out = {k: jnp.asarray(v) for k, v in batch.items()}
    if mesh is None:
        return out
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in out.items()}


def replicate(tree, mesh: Optional[jax.sharding.Mesh]):
    """Replicate a pytree (params / train state) over the mesh."""
    if mesh is None:
        return tree
    return jax.device_put(tree, replicated_sharding(mesh))
