"""Multi-session pretraining (BASELINE.json configs 4-5).

Trains one session-stitched MultiModal over many sessions: shared trunk,
per-session tokenizer/head params selected by a traced session id, batches
interleaved across sessions, DP over the device mesh with --dp.

Offline: --synthetic generates N sessions with varying neuron counts.
Online: --eids <eid1> <eid2> ... loads aligned IBL sessions from the hub.
"""

import argparse
import json
import os

from _common import (add_common_args, apply_config_overrides, build_mesh,
                     guard_overwrite, log_dir_for)

from multi_modal_foundation_model_tpu.config import (config_from_kwargs,
                                                     default_config_path,
                                                     update_config)
from multi_modal_foundation_model_tpu.data.session import (
    DEFAULT_TARGETS, load_ibl_session, synthetic_splits)
from multi_modal_foundation_model_tpu.models.multimodal import (
    MultiModal, MultiModalConfig)
from multi_modal_foundation_model_tpu.ops.masking import RegionTable
from multi_modal_foundation_model_tpu.train import (MetricLogger,
                                                    MultiSessionTrainer,
                                                    OptimizerConfig,
                                                    TrainerConfig,
                                                    build_multisession_loaders)


def main():
    ap = argparse.ArgumentParser()
    add_common_args(ap)
    ap.add_argument("--eids", type=str, nargs="*", default=None)
    ap.add_argument("--num_sessions", type=int, default=4,
                    help="synthetic session count")
    ap.add_argument("--mask_ratio", type=float, default=0.3)
    ap.add_argument("--use_MtM", action="store_true")
    ap.add_argument("--mixed_training", action="store_true")
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--pad_multiple", type=int, default=128)
    ap.add_argument("--eval_every", type=int, default=1,
                    help="run eval every N epochs (per-session metric "
                         "accumulation transfers gt/preds to host)")
    ap.add_argument("--steps_per_dispatch", type=int, default=1,
                    help="K-step lax.scan dispatch on the device-resident "
                         "path; wins at small per-step device time (B<~128"
                         " at this model scale), measured ~4%% SLOWER at "
                         "B=256 (chained-step carry copies; RESULTS.md)")
    ap.add_argument("--no_stacked_scan", action="store_true",
                    help="disable cross-session scan groups (fall back to "
                         "per-session grouping) for A/B")
    ap.add_argument("--n_buckets", type=int, default=1,
                    help="padded-width shape buckets (2-3 recommended for "
                         "wide neuron-count spreads): narrow sessions stop "
                         "paying the widest session's stitched GEMM "
                         "padding; one compiled program per bucket")
    ap.add_argument("--mixed_session_batches", action="store_true",
                    help="draw each batch's trials from ALL sessions (per-"
                         "sample session ids through the stitched gathers); "
                         "keeps batches full in the many-sessions/few-"
                         "trials regime")
    ap.add_argument("--shard_sessions", action="store_true",
                    help="with --mixed_session_batches and --dp > 1: shard "
                         "each resident block over the 'data' axis — every "
                         "host keeps only ITS sessions (HBM scales 1/hosts "
                         "with session count; batches stratify per shard)")
    ap.add_argument("--compile_retries", type=int, default=0,
                    help="retry a step's first call on TRANSIENT remote-"
                         "compile aborts (big K/B programs through the "
                         "tunnel; utils/prewarm.py)")
    ap.add_argument("--resume", action="store_true",
                    help="restore model_last from log_dir and continue")
    args = ap.parse_args()

    config = config_from_kwargs(
        {"model": f"include:{default_config_path('multi_modal/mm.yaml')}"})
    config = update_config(default_config_path("multi_modal/trainer_mm.yaml"),
                           config)
    config = apply_config_overrides(config, args.config_overrides)
    config.model.masker["ratio"] = args.mask_ratio
    if args.num_epochs is not None:
        config.training["num_epochs"] = args.num_epochs
    if args.batch_size is not None:
        config.training["train_batch_size"] = args.batch_size

    if args.synthetic or not args.eids:
        # cycle of 10 neuron widths (IBL-like spread without n_max growing
        # linearly in session count; identical to the old linear formula
        # for num_sessions <= 10)
        rng_neurons = [args.n_neurons + 37 * (i % 10)
                       for i in range(args.num_sessions)]
        sessions = {
            f"{args.eid}-{i}": synthetic_splits(
                seed=args.seed + i, n_trials=args.n_trials,
                n_neurons=rng_neurons[i], eid=f"{args.eid}-{i}")
            for i in range(args.num_sessions)}
    else:
        sessions = {e: load_ibl_session(e) for e in args.eids}

    avail_beh = list(DEFAULT_TARGETS)
    bs = int(config.training.train_batch_size)
    T = int(config.data.max_time_length)
    train, val, _, meta = build_multisession_loaders(
        sessions, batch_size=bs, max_time_length=T,
        pad_multiple=args.pad_multiple, n_buckets=args.n_buckets,
        target=avail_beh, seed=args.seed)
    table = RegionTable.build(meta["per_session_region_ids"],
                              region_vocab=meta["region_vocab"])

    modal_filter = {"input": ["ap", "behavior"], "output": ["ap", "behavior"]}
    log_dir = log_dir_for(args.base_path, f"multi{len(sessions)}",
                          modal_filter, f"stitched_ratio-{args.mask_ratio}")
    guard_overwrite(log_dir, args.overwrite or args.resume)
    os.makedirs(log_dir, exist_ok=True)
    with open(os.path.join(log_dir, "sessions.json"), "w") as f:
        json.dump({"eids": meta["eids"], "num_neurons": meta["num_neurons"],
                   "n_max": meta["n_max"]}, f)

    mm_config = MultiModalConfig.from_config(
        config.model,
        n_channels={"ap": meta["n_max"], "behavior": len(avail_beh)},
        n_sessions=len(meta["eids"]))
    model = MultiModal(mm_config)

    mask_mode = (("inter-region", "intra-region", "neuron", "temporal")
                 if args.use_MtM else tuple(config.training.mask_mode))
    # YAML-first (TrainerConfig.from_config reads every knob); CLI flags
    # override only when explicitly set away from their argparse defaults
    overrides = dict(
        mask_type="input" if args.use_MtM else str(config.training.mask_type),
        mask_mode=mask_mode, seed=args.seed, log_dir=log_dir)
    if args.mixed_training:
        overrides["mixed_training"] = True
    if args.device_resident:
        overrides["device_resident_data"] = True
    if args.eval_every != 1:
        overrides["eval_every"] = args.eval_every
    if args.steps_per_dispatch != 1:
        overrides["steps_per_dispatch"] = args.steps_per_dispatch
    if args.no_stacked_scan:
        overrides["stacked_scan"] = False
    if args.mixed_session_batches:
        overrides["mixed_session_batches"] = True
    if args.shard_sessions:
        overrides["shard_resident_sessions"] = True
    if args.compile_retries:
        overrides["compile_retries"] = args.compile_retries
    tcfg = TrainerConfig.from_config(config, **overrides)

    trainer = MultiSessionTrainer(
        model, train, val, OptimizerConfig.from_config(config.optimizer),
        tcfg, region_table=table, eid_to_sid=meta["eid_to_sid"],
        mesh=build_mesh(args.dp, args.tp), logger=MetricLogger(log_dir))
    start_epoch = 0
    if args.resume:
        start_epoch = trainer.restore("last") + 1
        print(f"resumed from epoch {start_epoch - 1}")
    summary = trainer.train(start_epoch=start_epoch)
    print("best:", {k: v for k, v in summary.items() if k != "history"})

    import jax
    stats = jax.local_devices()[0].memory_stats() or {}
    if "bytes_in_use" in stats:
        print("hbm: %.2f GB in use / %.2f GB peak" % (
            stats["bytes_in_use"] / 2**30,
            stats.get("peak_bytes_in_use", 0) / 2**30))
    else:
        # memory_stats() is unavailable on some runtimes (e.g. the axon
        # tunnel); fall back to the live-array footprint, which covers
        # params + opt state + device-resident data but not step temps.
        live = sum(getattr(a, "nbytes", 0) for a in jax.live_arrays())
        print("hbm: %.2f GB live arrays (params+opt+data; excludes "
              "step temporaries)" % (live / 2**30))


if __name__ == "__main__":
    main()
