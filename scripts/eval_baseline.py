"""Evaluate a trained linear baseline checkpoint.

Entry-point parity with ``/root/reference/src/eval_baseline.py``: runs the
baseline-supported modes (modal_spike for encoders, modal_behavior for
decoders — ``eval_baseline_utils.py:82-291``).
"""

import argparse
import json
import os

from _common import (add_common_args, get_session, log_dir_for,
                     warn_unsupported)

from multi_modal_foundation_model_tpu.data.loader import make_loader
from multi_modal_foundation_model_tpu.data.session import DEFAULT_TARGETS
from multi_modal_foundation_model_tpu.eval.baseline_harness import (
    co_smoothing_eval_baseline)
from multi_modal_foundation_model_tpu.models.baseline import (
    BaselineDecoder, BaselineEncoder)
from multi_modal_foundation_model_tpu.train import restore_checkpoint


def main():
    ap = argparse.ArgumentParser()
    add_common_args(ap)
    ap.add_argument("--direction", choices=["encoding", "decoding"],
                    default="decoding")
    ap.add_argument("--model_dir", type=str, default=None)
    ap.add_argument("--checkpoint", type=str, default="best")
    ap.add_argument("--n_time_steps", type=int, default=100)
    ap.add_argument("--save_plot", action="store_true",
                    help="per-neuron diagnostic figures (viz_single_cell layout)")
    args = ap.parse_args()
    warn_unsupported(args, 'dp', 'tp', 'device_resident')

    if args.direction == "encoding":
        modal_filter = {"input": ["behavior"], "output": ["ap"]}
    else:
        modal_filter = {"input": ["ap"], "output": ["behavior"]}
    model_dir = args.model_dir or log_dir_for(
        args.base_path, args.eid, modal_filter, "linear")

    with open(os.path.join(model_dir, "baseline_config.json")) as f:
        bcfg = json.load(f)
    if bcfg["direction"] == "encoding":
        model = BaselineEncoder(in_channel=bcfg["n_behaviors"],
                                out_channel=bcfg["n_neurons"],
                                seq_len=bcfg["seq_len"])
    else:
        model = BaselineDecoder(in_channel=bcfg["n_neurons"],
                                out_channel=bcfg["n_behaviors"])
    params = restore_checkpoint(model_dir, args.checkpoint)["params"]

    splits = get_session(args)
    T = args.n_time_steps
    test_loader = make_loader(
        splits.test, batch_size=splits.test.n_trials,
        target=list(DEFAULT_TARGETS), max_time_length=T,
        max_space_length=splits.n_neurons, shuffle=False, seed=args.seed)

    mode = "modal_spike" if "ap" in modal_filter["output"] else "modal_behavior"
    res = co_smoothing_eval_baseline(
        model, params, test_loader, mode,
        modal_filter=modal_filter,
        save_path=os.path.join(model_dir, "eval", mode),
        held_out_list=list(range(T)),
        avail_beh=list(DEFAULT_TARGETS), n_time_steps=T,
        save_plot=args.save_plot)
    print(json.dumps(res, indent=1, default=float))
    with open(os.path.join(model_dir, "eval", "results.json"), "w") as f:
        json.dump(res, f, indent=1, default=float)


if __name__ == "__main__":
    main()
