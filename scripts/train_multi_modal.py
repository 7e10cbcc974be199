"""Train the MultiModal model on one session.

Entry-point parity with ``/root/reference/src/train_multi_modal.py``
(same flags: --eid --mask_ratio --mask_mode --use_MtM --mixed_training
--overwrite --base_path), plus --synthetic for offline runs and --dp for
data parallelism over the device mesh.
"""

import argparse

from _common import (add_common_args, apply_config_overrides, build_mesh, get_session,
                     guard_overwrite, log_dir_for)

from multi_modal_foundation_model_tpu.config import (config_from_kwargs,
                                                     default_config_path,
                                                     update_config)
from multi_modal_foundation_model_tpu.data.loader import make_loader
from multi_modal_foundation_model_tpu.data.session import DEFAULT_TARGETS
from multi_modal_foundation_model_tpu.models.multimodal import (
    MultiModal, MultiModalConfig)
from multi_modal_foundation_model_tpu.train import (MetricLogger,
                                                    MultiModalTrainer,
                                                    OptimizerConfig,
                                                    TrainerConfig)


def main():
    ap = argparse.ArgumentParser()
    add_common_args(ap)
    ap.add_argument("--mask_ratio", type=float, default=0.1)
    ap.add_argument("--mask_mode", type=str, default="temporal")
    ap.add_argument("--use_MtM", action="store_true")
    ap.add_argument("--mixed_training", action="store_true")
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--resume", action="store_true",
                    help="restore model_last from log_dir and continue")
    args = ap.parse_args()

    config = config_from_kwargs(
        {"model": f"include:{default_config_path('multi_modal/mm.yaml')}"})
    config = update_config(default_config_path("multi_modal/trainer_mm.yaml"),
                           config)
    config = apply_config_overrides(config, args.config_overrides)
    config.model.masker["mode"] = args.mask_mode
    config.model.masker["ratio"] = args.mask_ratio
    if args.num_epochs is not None:
        config.training["num_epochs"] = args.num_epochs
    if args.batch_size is not None:
        config.training["train_batch_size"] = args.batch_size

    splits = get_session(args)
    n_neurons = splits.n_neurons
    avail_beh = list(DEFAULT_TARGETS)
    modal_filter = {"input": ["ap", "behavior"],
                    "output": ["ap", "behavior"]}
    log_dir = log_dir_for(
        args.base_path, args.eid, modal_filter,
        f"mask-{args.mask_mode}_ratio-{args.mask_ratio}"
        f"_mixed-{args.mixed_training}")
    guard_overwrite(log_dir, args.overwrite or args.resume)

    T = int(config.data.max_time_length)
    bs = int(config.training.train_batch_size)
    lkw = dict(batch_size=bs, target=avail_beh, max_time_length=T,
               max_space_length=n_neurons, seed=args.seed)
    train_loader = make_loader(splits.train, **lkw)
    region_vocab = train_loader.arrays["region_vocab"]
    val_loader = make_loader(splits.val, shuffle=False,
                             region_vocab=region_vocab, **lkw)

    mm_config = MultiModalConfig.from_config(
        config.model, n_channels={"ap": n_neurons, "behavior": len(avail_beh)})
    model = MultiModal(mm_config)

    # MtM scheme menu (reference uses config.training.mask_mode with
    # mask_type == "input"; --use_MtM selects the 4-scheme menu)
    if args.use_MtM:
        mask_type = "input"
        mask_mode = ("inter-region", "intra-region", "neuron", "temporal")
    else:
        mask_type = str(config.training.mask_type)
        mask_mode = tuple(config.training.mask_mode)

    # YAML-first: from_config reads every trainer knob (eval cadence,
    # plot cadence, runtime extensions); CLI flags override only when set
    overrides = dict(mask_type=mask_type, mask_mode=mask_mode,
                     seed=args.seed, log_dir=log_dir)
    if args.mixed_training:
        overrides["mixed_training"] = True
    if args.device_resident:
        overrides["device_resident_data"] = True
    tcfg = TrainerConfig.from_config(config, **overrides)
    ocfg = OptimizerConfig.from_config(config.optimizer)
    logger = MetricLogger(log_dir, use_wandb=bool(config.wandb.use),
                          wandb_project=config.wandb.project,
                          config=config.to_dict())

    trainer = MultiModalTrainer(
        model, train_loader, val_loader, ocfg, tcfg,
        modal_filter=modal_filter, num_neurons=[n_neurons],
        mesh=build_mesh(args.dp, args.tp), logger=logger)
    start_epoch = 0
    if args.resume:
        start_epoch = trainer.restore("last") + 1
        print(f"resumed from epoch {start_epoch - 1}")
    summary = trainer.train(start_epoch=start_epoch)
    print("best:", {k: v for k, v in summary.items() if k != "history"})


if __name__ == "__main__":
    main()
