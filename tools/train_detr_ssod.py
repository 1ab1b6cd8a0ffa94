"""Semi-supervised training entry (reference: tools/train_detr_ssod.py).

Usage:
  python tools/train_detr_ssod.py configs/detr_ssod/semi_detr_r50_coco_120k.py \
      --cfg-options fold=1 percent=10
"""
from __future__ import annotations

from common import (base_parser, build_dataset, class_names, load_cfg,
                    ssod_config)

from semi_detr_tpu.train.loop import SsodTrainer


def main():
    args = base_parser(__doc__).parse_args()
    cfg = load_cfg(args)
    names = class_names(cfg)

    sup = build_dataset(cfg["data"]["train_sup_ann"],
                        cfg["data"]["train_prefix"], names)
    unsup = build_dataset(cfg["data"]["train_unsup_ann"],
                          cfg["data"].get("unsup_prefix",
                                          cfg["data"]["train_prefix"]),
                          names, train=False)
    val = None
    if cfg["data"].get("val_ann"):
        val = build_dataset(cfg["data"]["val_ann"],
                            cfg["data"]["val_prefix"], names, train=False)

    sched = cfg["schedule"]
    trainer = SsodTrainer(
        ssod_config(cfg), sup, unsup, val,
        work_dir=cfg["work_dir"],
        total_steps=sched["total_steps"],
        lr=cfg["optimizer"]["lr"],
        lr_boundaries=tuple(sched.get("lr_boundaries", ())),
        samples_per_batch=sched.get("samples_per_batch", 5),
        sample_ratio=tuple(sched.get("sample_ratio", (1, 4))),
        by_prob=bool(sched.get("by_prob", False)),
        eval_interval=cfg.get("eval_interval", 4000),
        ckpt_interval=cfg.get("ckpt_interval", 4000),
        bucket=tuple(cfg.get("bucket", (800, 1344))),
        scales=([tuple(s) for s in cfg["scales"]]
                if cfg.get("scales") else None),
        seed=cfg.get("seed", 0),
        backbone_init=cfg.get("backbone_init"),
        load_from=cfg.get("load_from"),
        multi_bucket=bool(cfg.get("multi_bucket", False)),
        epoch_length=int(sched.get("epoch_length", 7330)),
        image_log_interval=int(cfg.get("image_log_interval", 2000)),
        fsdp=bool(cfg.get("fsdp", False)),
        tp=int(cfg.get("tp", 1)),
        donate=bool(cfg.get("donate", False)),
        use_wandb=bool(cfg.get("use_wandb", False)))
    if args.resume_from:
        trainer.resume(args.resume_from)
    elif trainer.ckpt.latest_step() is not None:
        trainer.resume()
    trainer.train(max_steps=args.max_steps)


if __name__ == "__main__":
    main()
