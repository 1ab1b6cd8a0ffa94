"""Recipe-scalar parity: every shipped recipe config must match the
reference's training recipe exactly.

Goldens are transcribed by hand from the reference configs (file:line
cited per row) — NOT loaded from /root/reference at test time — so the
test runs anywhere and a silent edit to either side fails loudly.

Round-4 verdict motivation: all three SSOD configs had drifted from the
reference LR schedule (`base_dino_detr_ssod_coco*.py:250` =
``lr_config = dict(step=[120000, 160000])``: no boundary fires inside
the 120k/80k runs -> constant LR; both fire inside 240k) without any
test noticing. This table makes the next drift impossible to land
silently.
"""
import os

import pytest

from semi_detr_tpu.utils.config import load_config

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")

# golden table, one row per recipe. Sources (in /root/reference):
#   configs/detr_ssod/detr_ssod_dino_detr_r50_coco_120k.py:4,22,32,34,43,47
#   configs/detr_ssod/detr_ssod_dino_detr_r50_coco_full_240k.py:6,24,34,36,47
#   configs/detr_ssod/detr_ssod_dino_detr_r50_voc_80k.py:8,41,52,54,65
#   configs/detr_ssod/base_dino_detr_ssod_coco*.py:249-252 (eval/ckpt 4000,
#     keep 5), :250 (lr step=[120000,160000])
#   configs/dino_detr/dino_detr_ssod_r50_coco_120k.py:52 (warm_up 60000),
#     :130-136 (AdamW lr 1e-4, wd 1e-4, backbone lr_mult 0.1, clip 0.1)
#   configs/dino_detr/dino_detr_ssod_r50_coco_full_240k.py:52 (warm_up 120000)
#   configs/dino_detr/dino_detr_ssod_r50_voc_80k.py:25,52 (num_classes 20,
#     warm_up 40000)
GOLDENS = {
    "detr_ssod/semi_detr_r50_coco_120k.py": dict(
        num_classes=80, total_steps=120000, lr_boundaries=[],
        samples_per_batch=5, sample_ratio=[1, 4], score_thr=0.4,
        unsup_weight=4.0, warm_up_step=60000, ema_momentum=0.999,
        eval_interval=4000, ckpt_interval=4000,
        lr=1e-4, weight_decay=1e-4, backbone_lr_mult=0.1, clip_norm=0.1,
    ),
    "detr_ssod/semi_detr_r50_coco_full_240k.py": dict(
        num_classes=80, total_steps=240000,
        lr_boundaries=[120000, 160000],
        samples_per_batch=8, sample_ratio=[1, 1], score_thr=0.4,
        unsup_weight=2.0, warm_up_step=120000, ema_momentum=0.999,
        eval_interval=4000, ckpt_interval=4000,
        lr=1e-4, weight_decay=1e-4, backbone_lr_mult=0.1, clip_norm=0.1,
    ),
    "detr_ssod/semi_detr_r50_voc_80k.py": dict(
        num_classes=20, total_steps=80000, lr_boundaries=[],
        samples_per_batch=5, sample_ratio=[1, 4], score_thr=0.4,
        unsup_weight=4.0, warm_up_step=40000, ema_momentum=0.999,
        eval_interval=4000, ckpt_interval=4000,
        lr=1e-4, weight_decay=1e-4, backbone_lr_mult=0.1, clip_norm=0.1,
    ),
}


def _actual(cfg):
    """Flatten the recipe scalars the goldens assert, from a loaded cfg."""
    opt = cfg.get("optimizer", {})
    sch = cfg.get("schedule", {})
    ssod = cfg.get("ssod", {})
    return dict(
        num_classes=cfg["model"].get("num_classes"),
        total_steps=sch.get("total_steps"),
        lr_boundaries=list(sch.get("lr_boundaries", [])),
        samples_per_batch=sch.get("samples_per_batch"),
        sample_ratio=list(sch.get("sample_ratio", [])),
        score_thr=ssod.get("score_thr"),
        unsup_weight=ssod.get("unsup_weight"),
        warm_up_step=ssod.get("warm_up_step"),
        ema_momentum=ssod.get("ema_momentum"),
        eval_interval=cfg.get("eval_interval", 4000),
        ckpt_interval=cfg.get("ckpt_interval", 4000),
        lr=opt.get("lr"),
        weight_decay=opt.get("weight_decay"),
        backbone_lr_mult=opt.get("backbone_lr_mult"),
        clip_norm=opt.get("clip_norm"),
    )


@pytest.mark.parametrize("rel", sorted(GOLDENS))
def test_recipe_scalars_match_reference(rel):
    cfg = load_config(os.path.join(CFG_DIR, rel))
    actual = _actual(cfg)
    golden = GOLDENS[rel]
    mismatches = {k: (golden[k], actual.get(k))
                  for k in golden if actual.get(k) != golden[k]}
    assert not mismatches, (
        f"{rel}: recipe scalars deviate from the reference "
        f"(golden, actual): {mismatches}")


def test_supervised_12e_schedule():
    """Supervised baseline: 12 epochs at bs16, lr x0.1 at epoch 11
    (`dino_detr_r50_8x2_12e_coco.py:122-139`). 117266 train2017 images
    / bs16 ~= 7329 it/epoch -> 88k total, boundary ~= 80.6k."""
    cfg = load_config(os.path.join(CFG_DIR, "dino_detr",
                                   "dino_detr_r50_coco.py"))
    sch = cfg["schedule"]
    assert sch["total_steps"] == 88000
    assert len(sch["lr_boundaries"]) == 1
    assert abs(sch["lr_boundaries"][0] - 11 * 7330) < 200
