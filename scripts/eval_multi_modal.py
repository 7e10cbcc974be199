"""Evaluate a trained MultiModal checkpoint.

Entry-point parity with ``/root/reference/src/eval_multi_modal.py``:
modal_spike + modal_behavior run by default (``eval_multi_modal.py:71-80``),
the other co-smoothing modes are opt-in flags; artifacts land per mode under
``<model_dir>/eval/<mode>/{bps,r2}.npy`` plus a combined ``results.json``.
"""

import argparse
import json
import os


from _common import (add_common_args, get_session, log_dir_for,
                     warn_unsupported)

from multi_modal_foundation_model_tpu.data.session import DEFAULT_TARGETS
from multi_modal_foundation_model_tpu.eval import (co_smoothing_eval,
                                                   load_model_data_local)


def build_modes(args, T):
    """Eval-mode list from the entry flags (reference defaults:
    modal_spike + modal_behavior on, co-smoothing modes opt-in —
    ``eval_multi_modal.py:71-80``)."""
    modes = []
    if args.co_smooth:
        modes.append(("per_neuron", {}))
    if args.forward_pred:
        modes.append(("forward_pred",
                      {"held_out_list": list(range(int(0.7 * T), T))}))
    if args.inter_region:
        modes.append(("inter_region", {}))
    if args.intra_region:
        modes.append(("intra_region", {}))
    if not args.no_modal_spike:
        modes.append(("modal_spike", {"held_out_list": list(range(T))}))
    if not args.no_modal_behavior:
        modes.append(("modal_behavior", {"held_out_list": list(range(T))}))
    return modes


def eval_multi_session(args):
    """Six-mode co-smoothing over every session of a stitched checkpoint.

    The trained session inventory (eid order, per-session neuron counts,
    N_max) comes from the checkpoint's ``sessions.json`` sidecar; synthetic
    sessions are regenerated with the train script's seeding convention
    (``train_multi_session.py``: seed = --seed + index, eid suffix -i),
    real sessions reload from the hub by eid."""
    import numpy as np

    from multi_modal_foundation_model_tpu.data.session import \
        load_ibl_session
    from multi_modal_foundation_model_tpu.eval import \
        load_multisession_model_data_local

    with open(os.path.join(args.model_dir, "sessions.json")) as f:
        meta = json.load(f)

    test_sessions = {}
    for i, eid in enumerate(meta["eids"]):
        if args.synthetic:
            from multi_modal_foundation_model_tpu.data.session import \
                synthetic_splits
            # the train script seeds synthetic sessions by GENERATION index
            # (the eid's "-<g>" suffix); meta["eids"] is sorted, which
            # diverges from generation order past 10 sessions ("x-10"<"x-2")
            gen = eid.rsplit("-", 1)[-1]
            g = int(gen) if gen.isdigit() else i
            splits = synthetic_splits(
                seed=args.seed + g, n_trials=args.n_trials,
                n_neurons=int(meta["num_neurons"][i]), eid=eid)
        else:
            splits = load_ibl_session(eid)
        test_sessions[eid] = splits.test

    model, params, loaders, eid_to_sid = load_multisession_model_data_local(
        model_dir=args.model_dir, test_sessions=test_sessions,
        checkpoint_name=args.checkpoint,
        max_time_length=args.n_time_steps, seed=args.seed)

    T = args.n_time_steps
    modes = build_modes(args, T)
    results = {}
    for eid, loader in loaders.items():
        per_eid = {}
        for mode, kw in modes:
            save_path = os.path.join(args.model_dir, "eval", eid, mode)
            res = co_smoothing_eval(
                model, params, loader, mode=mode, use_mtm=args.use_MtM,
                save_path=save_path, n_time_steps=T,
                save_plot=args.save_plot, is_aligned=not args.unaligned,
                avail_beh=list(DEFAULT_TARGETS),
                session_id=eid_to_sid[eid], **kw)
            per_eid.update({k: (v if isinstance(v, dict) else float(v))
                            for k, v in res.items()})
            print(f"[{eid}][{mode}]",
                  json.dumps(per_eid, default=float)[:300])
        results[eid] = per_eid

    # cross-session summary: mean over sessions of each scalar key
    summary = {}
    for per_eid in results.values():
        for k, v in per_eid.items():
            if isinstance(v, dict):
                for bk, bv in v.items():
                    summary.setdefault(f"{k}.{bk}", []).append(float(bv))
            else:
                summary.setdefault(k, []).append(float(v))
    results["mean_over_sessions"] = {
        k: float(np.nanmean(v)) for k, v in summary.items()}

    out = os.path.join(args.model_dir, "eval", "results.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=float)
    print("saved:", out)
    print("mean over sessions:",
          json.dumps(results["mean_over_sessions"], default=float))


def main():
    ap = argparse.ArgumentParser()
    add_common_args(ap)
    ap.add_argument("--mask_ratio", type=float, default=0.1)
    ap.add_argument("--mask_mode", type=str, default="temporal")
    ap.add_argument("--mixed_training", action="store_true")
    ap.add_argument("--use_MtM", action="store_true",
                    help="mask model inputs at eval (co-smoothing proper)")
    ap.add_argument("--model_dir", type=str, default=None,
                    help="checkpoint dir; default derives from the train layout")
    ap.add_argument("--checkpoint", type=str, default="best")
    ap.add_argument("--reference_ckpt", type=str, default=None,
                    help="evaluate a REFERENCE-trained torch checkpoint "
                         "(model_best.pt module pickle or a state_dict .pt) "
                         "instead of an orbax dir")
    ap.add_argument("--reference_src", type=str, default=None,
                    help="reference source root (needed to unpickle "
                         "whole-module checkpoints), e.g. /root/reference/src")
    ap.add_argument("--co_smooth", action="store_true")
    ap.add_argument("--forward_pred", action="store_true")
    ap.add_argument("--inter_region", action="store_true")
    ap.add_argument("--intra_region", action="store_true")
    ap.add_argument("--no_modal_spike", action="store_true")
    ap.add_argument("--no_modal_behavior", action="store_true")
    ap.add_argument("--n_time_steps", type=int, default=100)
    ap.add_argument("--save_plot", action="store_true",
                    help="per-neuron diagnostic figures (viz_single_cell layout)")
    ap.add_argument("--unaligned", action="store_true",
                    help="evaluate on the unaligned (chunked) session: "
                         "loads <eid>_unaligned from the hub (IBL runs) and "
                         "drives the harness's is_aligned=False path — "
                         "plain R² instead of task-condition PSTHs, "
                         "unaligned raster figures "
                         "(reference eval_utils.py:1392-1459)")
    ap.add_argument("--multi_session", action="store_true",
                    help="evaluate a session-stitched multi-session "
                         "checkpoint (train_multi_session.py): every mode "
                         "runs once per trained session, artifacts land "
                         "under <model_dir>/eval/<eid>/<mode>/; the eid "
                         "list and session order come from the checkpoint's "
                         "sessions.json sidecar")
    args = ap.parse_args()
    warn_unsupported(args, 'dp', 'tp', 'device_resident')

    modal_filter = {"input": ["ap", "behavior"], "output": ["ap", "behavior"]}
    model_dir = args.model_dir or log_dir_for(
        args.base_path, args.eid, modal_filter,
        f"mask-{args.mask_mode}_ratio-{args.mask_ratio}"
        f"_mixed-{args.mixed_training}")

    if args.multi_session:
        assert args.model_dir, "--multi_session requires --model_dir"
        return eval_multi_session(args)

    splits = get_session(args)
    if args.reference_ckpt:
        from multi_modal_foundation_model_tpu.data.loader import make_loader
        from multi_modal_foundation_model_tpu.eval.loading import \
            load_reference_checkpoint

        model, params = load_reference_checkpoint(
            args.reference_ckpt,
            n_channels={"ap": splits.n_neurons,
                        "behavior": len(DEFAULT_TARGETS)},
            max_F=args.n_time_steps, reference_src=args.reference_src)
        test_loader = make_loader(
            splits.test, batch_size=splits.test.n_trials,
            max_time_length=args.n_time_steps,
            max_space_length=splits.n_neurons, shuffle=False)
        model_dir = args.model_dir or os.path.join(
            args.base_path, "reference_ckpt_eval")
    else:
        model, params, test_loader = load_model_data_local(
            model_dir=model_dir, test_session=splits.test,
            checkpoint_name=args.checkpoint,
            max_time_length=args.n_time_steps,
            max_space_length=splits.n_neurons, seed=args.seed)

    T = args.n_time_steps
    modes = build_modes(args, T)

    results = {}
    for mode, kw in modes:
        sub = "eval_unaligned" if args.unaligned else "eval"
        save_path = os.path.join(model_dir, sub, mode)
        res = co_smoothing_eval(
            model, params, test_loader, mode=mode, use_mtm=args.use_MtM,
            save_path=save_path, n_time_steps=T, save_plot=args.save_plot,
            is_aligned=not args.unaligned,
            avail_beh=list(DEFAULT_TARGETS), **kw)
        results.update({k: (v if isinstance(v, dict) else float(v))
                        for k, v in res.items()})
        print(f"[{mode}]", json.dumps(results, default=float)[:400])

    sub = "eval_unaligned" if args.unaligned else "eval"
    with open(os.path.join(model_dir, sub, "results.json"), "w") as f:
        json.dump(results, f, indent=1, default=float)
    print("saved:", os.path.join(model_dir, sub, "results.json"))


if __name__ == "__main__":
    main()
