"""Model + data loading for the eval entry points.

Equivalent of the reference ``load_model_data_local``
(``/root/reference/src/utils/eval_utils.py:37-83``): loads the trained
model and builds a single full-test-set batch loader. Differences by
design: checkpoints are orbax pytrees with a ``model_config.json`` sidecar
(written by :func:`save_model_config`) instead of pickled ``nn.Module``s,
and masking is disabled by *configuration* (`force_active=False`,
``ratio=0`` — the reference mutates the loaded masker in place,
``eval_utils.py:64-67``).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

from ..data.loader import DataLoader, make_loader
from ..data.session import SessionData
from ..models.multimodal import MultiModal, MultiModalConfig
from ..train.checkpoint import restore_checkpoint


def save_model_config(log_dir: str, config: MultiModalConfig) -> str:
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, "model_config.json")
    with open(path, "w") as f:
        json.dump(config.to_json_dict(), f, indent=1)
    return path


def load_model_config(log_dir: str) -> MultiModalConfig:
    with open(os.path.join(log_dir, "model_config.json")) as f:
        return MultiModalConfig.from_json_dict(json.load(f))


def load_model_data_local(
    *,
    model_dir: str,
    test_session: SessionData,
    checkpoint_name: str = "best",
    max_time_length: int = 100,
    max_space_length: Optional[int] = None,
    seed: int = 42,
    batch_size: Optional[int] = None,
) -> Tuple[MultiModal, Dict[str, Any], DataLoader]:
    """Returns (model, params, full-test-set loader).

    The masker is disabled for eval (ratio=0, force_active=False) exactly
    like the reference disables the loaded module's masker; heldout masking
    at eval time arrives through explicit ``eval_mask`` tensors instead.
    """
    config = load_model_config(model_dir)
    config = dataclasses.replace(
        config,
        mask_params=dataclasses.replace(config.mask_params, ratio=0.0),
        force_active=False)
    model = MultiModal(config)
    tree = restore_checkpoint(model_dir, checkpoint_name)
    params = tree["params"]

    n_space = max_space_length or config.n_channels["ap"]
    loader = make_loader(
        test_session,
        batch_size=batch_size or test_session.n_trials,
        max_time_length=max_time_length,
        max_space_length=n_space,
        shuffle=False,
        seed=seed,
    )
    return model, params, loader
