"""Semi-DETR VOC recipe (labeled VOC07 trainval, unlabeled VOC12).

Mirrors `configs/dino_detr/dino_detr_ssod_r50_voc_80k.py`:
num_classes 20, warm_up_step 40k, 80k iters.
"""
_base_ = ["semi_detr_r50_coco_120k.py"]

model = dict(num_classes=20)

ssod = dict(warm_up_step=40000)

# Reference `base_dino_detr_ssod_voc.py:250` keeps
# lr_config = dict(step=[120000, 160000]) — no boundary fires inside
# the 80k run, so VOC trains at constant LR.
schedule = dict(_delete_=True, total_steps=80000, lr_boundaries=[],
                samples_per_batch=5, sample_ratio=[1, 4])

data = dict(
    _delete_=True,
    train_sup_ann="data/voc/voc07_trainval.json",
    train_unsup_ann="data/voc/voc12_trainval.json",
    val_ann="data/voc/voc07_test.json",
    train_prefix="data/voc/VOC2007/JPEGImages",
    unsup_prefix="data/voc/VOC2012/JPEGImages",
    val_prefix="data/voc/VOC2007/JPEGImages",
    classes="voc",
)

work_dir = "work_dirs/semi_detr_r50_voc"
