"""Supervised DINO-DETR R50 COCO — model-level config.

Mirrors the reference `configs/dino_detr/dino_detr_r50_8x2_12e_coco.py`
(AdamW lr 1e-4 wd 1e-4, backbone lr x0.1, grad clip 0.1, bs 16) in the
dict-based config format of semi_detr_tpu.utils.config.
"""
model = dict(
    num_classes=80,
    num_queries=900,
    d_model=256,
    n_heads=8,
    n_levels=4,
    num_encoder_layers=6,
    num_decoder_layers=6,
    d_ffn=2048,
    backbone_depth=50,
    dn_labelbook_size=81,
    # 200-slot CDN budget (reference 2*dn_number, dn_components.py:164);
    # the (single_pad, groups) partition adapts per batch in-graph
    dn_single_pad=100,
    dn_groups=1,
    dn_label_noise_ratio=0.5,
    dn_box_noise_scale=0.4,
    max_gt=100,
    # flagship-scale training on TPU needs both (see PARITY.md):
    dtype="bfloat16",
    remat=True,
)

optimizer = dict(lr=1e-4, weight_decay=1e-4, backbone_lr_mult=0.1,
                 clip_norm=0.1)

# 12-epoch schedule at bs16 over ~117k images ≈ 88k iters; lr x0.1 at
# epoch 11 (reference step=[11])
schedule = dict(total_steps=88000, lr_boundaries=[80700], batch_size=16)

data = dict(
    train_ann="data/coco/annotations/instances_train2017.json",
    val_ann="data/coco/annotations/instances_val2017.json",
    train_prefix="data/coco/train2017",
    val_prefix="data/coco/val2017",
    classes="coco",
)

work_dir = "work_dirs/dino_detr_r50_coco"
eval_interval = 4000
ckpt_interval = 4000
seed = 0
