"""Checkpoint conversion CLI: reference torch <-> this framework (orbax).

Two directions (``utils.torch_convert`` does the tree mapping):

- ``to-flax``: a reference checkpoint (``model_best.pt`` whole-module
  pickle, or a ``state_dict`` .pt) -> an orbax ``model_<name>/`` dir +
  ``model_config.json`` sidecar, directly consumable by
  ``eval.load_model_data_local``. The trainers' ``restore`` also accepts
  it (params restored; optimizer state freshly initialized, with a
  warning — the reference checkpoint has no optimizer state to convert).
- ``to-torch``: an orbax checkpoint dir -> a ``state_dict`` .pt in the
  reference's parameter naming, loadable with
  ``ref_model.load_state_dict(torch.load(out))`` on the reference side.

Examples:
  python scripts/convert_checkpoint.py to-flax ref/model_best.pt out_dir \
      --n-neurons 668 --reference-src /root/reference/src
  python scripts/convert_checkpoint.py to-torch results/ses-x/model_best \
      out/state_dict.pt
"""

from __future__ import annotations

import argparse
import os

from _common import *  # noqa: F401,F403 — path + platform setup


def to_flax(args):
    from multi_modal_foundation_model_tpu.eval.loading import (
        load_reference_checkpoint, save_model_config)
    from multi_modal_foundation_model_tpu.train.checkpoint import \
        save_checkpoint

    model, params = load_reference_checkpoint(
        args.src, n_channels={"ap": args.n_neurons,
                              "behavior": args.n_behaviors},
        max_F=args.max_F, reference_src=args.reference_src)
    os.makedirs(args.dst, exist_ok=True)
    save_model_config(args.dst, model.config)
    path = save_checkpoint(args.dst, args.name, {"params": params},
                           meta={"converted_from": os.path.abspath(args.src)})
    print(f"wrote {path} (+ model_config.json)")


def to_torch(args):
    import numpy as np

    from multi_modal_foundation_model_tpu.eval.loading import \
        load_model_config
    from multi_modal_foundation_model_tpu.train.checkpoint import \
        restore_checkpoint
    from multi_modal_foundation_model_tpu.utils.torch_convert import \
        params_to_reference_state_dict

    src_dir, name = os.path.split(os.path.abspath(args.src.rstrip("/")))
    assert name.startswith("model_"), \
        f"expected a model_<name> orbax dir, got {args.src}"
    tree = restore_checkpoint(src_dir, name[len("model_"):])
    params = tree["params"] if "params" in tree else tree
    try:
        cfg = load_model_config(src_dir)
        avail_mod = cfg.avail_mod
        shared = cfg.share_modality_embeddings
    except FileNotFoundError:
        avail_mod, shared = ("ap", "behavior"), True
    sd = params_to_reference_state_dict(
        params, avail_mod=avail_mod, share_modality_embeddings=shared)

    import torch

    os.makedirs(os.path.dirname(os.path.abspath(args.dst)) or ".",
                exist_ok=True)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, args.dst)
    print(f"wrote {args.dst} ({len(sd)} tensors, reference naming)")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("to-flax", help="reference .pt -> orbax dir")
    f.add_argument("src"), f.add_argument("dst")
    f.add_argument("--name", default="best")
    f.add_argument("--n-neurons", type=int, required=True)
    f.add_argument("--n-behaviors", type=int, default=2)
    f.add_argument("--max-F", type=int, default=100)
    f.add_argument("--reference-src", default=None)
    f.set_defaults(fn=to_flax)

    t = sub.add_parser("to-torch", help="orbax model_<name> dir -> state_dict .pt")
    t.add_argument("src"), t.add_argument("dst")
    t.set_defaults(fn=to_torch)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
