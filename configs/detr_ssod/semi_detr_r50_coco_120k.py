"""Semi-DETR COCO-partial recipe (the headline 120k config).

Mirrors the reference `configs/detr_ssod/detr_ssod_dino_detr_r50_coco_120k.py`
+ `configs/dino_detr/dino_detr_ssod_r50_coco_120k.py`: fold/percent
templated annotation paths, score thr 0.4, unsup weight 4.0, ratio [1,4],
bs 5/device, 120k iters, warm_up_step 60k, EMA 0.999, eval every 4k on
teacher+student.
"""
_base_ = ["../dino_detr/dino_detr_r50_coco.py"]

fold = 1
percent = 1

ssod = dict(
    max_pseudo=32,
    cons_groups=5,
    score_thr=0.4,
    unsup_weight=4.0,
    warm_up_step=60000,
    consistency_weight=10.0,
    ema_momentum=0.999,
    nms_iou=0.6,
    nms_score_thr=0.01,
)

semi_wrapper = dict(type="SsodTrainer")

# Reference `base_dino_detr_ssod_coco.py:250` sets
# lr_config = dict(step=[120000, 160000]) — NEITHER boundary fires
# inside the 120k run, so the recipe trains at constant LR.
schedule = dict(_delete_=True, total_steps=120000, lr_boundaries=[],
                samples_per_batch=5, sample_ratio=[1, 4])

data = dict(
    train_sup_ann=("data/coco/annotations/semi_supervised/"
                   "instances_train2017.${fold}@${percent}.json"),
    train_unsup_ann=("data/coco/annotations/semi_supervised/"
                     "instances_train2017.${fold}@${percent}-unlabeled"
                     ".json"),
    val_ann="data/coco/annotations/instances_val2017.json",
    train_prefix="data/coco/train2017",
    val_prefix="data/coco/val2017",
    classes="coco",
)

work_dir = "work_dirs/semi_detr_r50_coco_${percent}_${fold}"
