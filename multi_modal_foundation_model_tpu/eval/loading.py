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


def load_multisession_model_data_local(
    *,
    model_dir: str,
    test_sessions: Dict[str, SessionData],
    checkpoint_name: str = "best",
    max_time_length: int = 100,
    seed: int = 42,
) -> Tuple[MultiModal, Dict[str, Any], Dict[str, DataLoader],
           Dict[str, int]]:
    """Multi-session analog of :func:`load_model_data_local`.

    Loads a session-stitched checkpoint (``n_sessions > 1``) together with
    its ``sessions.json`` sidecar (written by ``train_multi_session.py``)
    and returns ``(model, params, {eid: full-test-set loader}, eid_to_sid)``
    — one loader per session, every session padded to the checkpoint's
    ``N_max`` so the stitched forward runs at its trained width. The eval
    harness then scores each session with ``session_id=eid_to_sid[eid]``.

    The reference applies its eval instrument per trained model
    (``/root/reference/src/utils/eval_utils.py:37-83``); multi-session
    stitching is framework-new, so this loader is its eval-side contract.
    """
    config = load_model_config(model_dir)
    if config.n_sessions <= 1:
        raise ValueError(
            f"{model_dir} holds a single-session checkpoint "
            "(n_sessions=1); use load_model_data_local")
    config = dataclasses.replace(
        config,
        mask_params=dataclasses.replace(config.mask_params, ratio=0.0),
        force_active=False)
    model = MultiModal(config)
    tree = restore_checkpoint(model_dir, checkpoint_name)
    params = tree["params"]

    with open(os.path.join(model_dir, "sessions.json")) as f:
        meta = json.load(f)
    eid_to_sid = {e: i for i, e in enumerate(meta["eids"])}
    n_max = int(meta["n_max"])

    missing = set(test_sessions) - set(eid_to_sid)
    if missing:
        raise ValueError(
            f"sessions {sorted(missing)} not in the checkpoint's "
            f"sessions.json (trained eids: {meta['eids']})")

    loaders = {
        eid: make_loader(
            sess, batch_size=sess.n_trials,
            max_time_length=max_time_length, max_space_length=n_max,
            shuffle=False, seed=seed)
        for eid, sess in test_sessions.items()}
    return model, params, loaders, eid_to_sid


def load_reference_checkpoint(
    path: str,
    n_channels: Dict[str, int],
    max_F: int = 100,
    reference_src: Optional[str] = None,
    **config_overrides,
) -> Tuple[MultiModal, Dict[str, Any]]:
    """Load a REFERENCE-trained checkpoint into this framework.

    Accepts either form the reference ecosystem produces:

    - a ``state_dict`` saved with ``torch.save(model.state_dict(), ...)``
      (or a dict containing one under ``'model'``/``'state_dict'``), or
    - the reference's whole-module pickle
      (``torch.save({'model': <MultiModal instance>, ...})``,
      ``src/trainer/base.py:302-308``) — unpickling that requires the
      reference package importable; pass ``reference_src`` (e.g.
      ``/root/reference/src``) and it is added to ``sys.path`` for the
      load.

    Returns ``(model, params)`` ready for the eval harness: weights mapped
    through ``utils.torch_convert`` onto the flax tree, masker disabled
    for eval, ``attn_impl``/dtype overridable via ``config_overrides``.
    """
    import numpy as np

    from ..utils.torch_convert import reference_state_dict_to_params

    import torch  # local import: torch is only needed on this path

    if reference_src:
        import sys
        if reference_src not in sys.path:
            sys.path.insert(0, reference_src)

    # Plain state_dict checkpoints need no unpickling of arbitrary code —
    # load those with weights_only=True. Only the reference's whole-module
    # pickle format (trainer/base.py:302-308) requires full unpickling;
    # fall back to it with a warning so evaluating an untrusted .pt does
    # not silently execute pickle payloads.
    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        import warnings
        warnings.warn(
            f"{path} is not a plain-tensor checkpoint; falling back to "
            "weights_only=False (full unpickling — only do this for "
            "checkpoints you trust, e.g. the reference's whole-module "
            "pickles)", stacklevel=2)
        obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        sd = obj.state_dict()
    elif isinstance(obj, dict) and hasattr(obj.get("model"), "state_dict"):
        sd = obj["model"].state_dict()
    elif isinstance(obj, dict) and isinstance(obj.get("state_dict"), dict):
        sd = obj["state_dict"]
    elif isinstance(obj, dict) and isinstance(obj.get("model"), dict):
        sd = obj["model"]
    elif isinstance(obj, dict):
        sd = obj
    else:
        raise ValueError(f"unrecognized checkpoint object: {type(obj)}")
    sd = {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach")
                        else v) for k, v in sd.items()}

    # architecture dims recoverable from the state_dict itself (n_heads is
    # not — it doesn't change param shapes; override it for non-default
    # architectures)
    n_enc = 1 + max((int(k.split(".")[1]) for k in sd
                     if k.startswith("encoder.")), default=4)
    n_dec = 1 + max((int(k.split(".")[1]) for k in sd
                     if k.startswith("decoder.")), default=4)
    hidden = sd["encoder_norm.weight"].shape[0]
    inter = sd["encoder.0.mlp.up_proj.weight"].shape[0]
    ap_tok = sd["encoder_embeddings.ap.embedder.token_embed.weight"]
    mult = max(1, round(ap_tok.shape[0] / max(ap_tok.shape[1], 1)))
    if ap_tok.shape[1] != n_channels.get("ap"):
        raise ValueError(
            f"checkpoint expects {ap_tok.shape[1]} 'ap' channels, "
            f"caller provided {n_channels.get('ap')}")

    kw: Dict[str, Any] = dict(
        n_channels=dict(n_channels), max_F=max_F, hidden_size=hidden,
        n_enc_layers=n_enc, n_dec_layers=n_dec, inter_size=inter,
        mult=mult, force_active=False)
    kw.update(config_overrides)
    config = MultiModalConfig(**kw)
    config = dataclasses.replace(
        config,
        mask_params=dataclasses.replace(config.mask_params, ratio=0.0))
    params = reference_state_dict_to_params(
        sd, avail_mod=config.avail_mod, n_enc_layers=n_enc,
        n_dec_layers=n_dec,
        share_modality_embeddings=config.share_modality_embeddings)
    return MultiModal(config), params
