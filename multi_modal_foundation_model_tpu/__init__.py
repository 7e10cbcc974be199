"""TPU-native multi-modal neural foundation model framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``yzhang511/multi_modal_foundation_model`` (a PyTorch research codebase for
multi-modal masked-autoencoder modeling of IBL mouse electrophysiology):

- multi-modal (spikes + behavior) encoder-decoder transformer with
  Pallas flash-attention kernels and Poisson-NLL / MSE heads,
- the full multi-task-masking (MtM) scheme engine as PRNG-keyed
  functional ops,
- jitted train/eval steps with optax AdamW + OneCycle, orbax
  checkpointing, and SPMD data parallelism over a ``jax.sharding.Mesh``,
- the NLB-compatible co-smoothing / behavior-decoding eval harness.

Package layout mirrors the subsystem inventory in ``SURVEY.md``:

- ``config``   : YAML config system with ``include:`` + recursive override
- ``data``     : CSR spike codec, session datasets, fixed-shape batching
- ``models``   : flax modules (MultiModal, tokenizers, baselines, masker)
- ``ops``      : Pallas kernels + fused XLA ops (attention, losses, masking)
- ``parallel`` : mesh construction and sharding rules
- ``train``    : trainers, train state, schedules, checkpointing
- ``eval``     : heldout-mask builders, co-smoothing harness, metrics
"""

__version__ = "0.1.0"

MODALITY_AP = "ap"
MODALITY_BEHAVIOR = "behavior"
DEFAULT_MODALITIES = (MODALITY_AP, MODALITY_BEHAVIOR)
