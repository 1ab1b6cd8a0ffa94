"""Semi-DETR COCO-full recipe (train2017 labeled + unlabeled2017).

Mirrors `configs/detr_ssod/detr_ssod_dino_detr_r50_coco_full_240k.py`:
bs 8, ratio [1,1], unsup_weight 2.0, 240k iters, warm_up 120k.
"""
_base_ = ["semi_detr_r50_coco_120k.py"]

ssod = dict(unsup_weight=2.0, warm_up_step=120000)

# Reference `base_dino_detr_ssod_coco_full.py:250`:
# lr_config = dict(step=[120000, 160000]) — both fire inside 240k.
schedule = dict(_delete_=True, total_steps=240000,
                lr_boundaries=[120000, 160000],
                samples_per_batch=8, sample_ratio=[1, 1])

data = dict(
    _delete_=True,
    train_sup_ann="data/coco/annotations/instances_train2017.json",
    train_unsup_ann="data/coco/annotations/instances_unlabeled2017.json",
    val_ann="data/coco/annotations/instances_val2017.json",
    train_prefix="data/coco/train2017",
    unsup_prefix="data/coco/unlabeled2017",
    val_prefix="data/coco/val2017",
    classes="coco",
)

work_dir = "work_dirs/semi_detr_r50_coco_full"
