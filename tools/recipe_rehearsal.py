"""Flagship recipe dress rehearsal — the final readiness gate for real data.

Drives the REAL 120k SSOD config (`configs/detr_ssod/semi_detr_r50_coco_120k.py`
hyperparameters: R50 + 6/6 transformer, 900 queries, bs 1 sup + 4 unsup,
800x1344 bucket, bf16+remat) end to end on synthetic COCO-shaped data
through the actual user surface (`tools/train_detr_ssod.py` subprocesses),
exercising:

  * both train stages (warm_up boundary placed mid-run -> 2 compiles),
  * periodic teacher+student eval (eval_interval mid-stage),
  * checkpointing + a MID-RUN KILL-AND-RESUME (second subprocess resumes
    from the work-dir checkpoint, the reference's latest.pth semantics),
  * throughput + HBM capture from metrics.jsonl / train.log.

Writes RECIPE_REHEARSAL.md at the repo root with the measured numbers.

Usage (expects the TPU; ~1 h at the default 600 steps incl. compiles):
  python tools/recipe_rehearsal.py [--steps 600] [--workdir /tmp/rehearsal]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_dataset(root: str, n_imgs: int):
    sys.path.insert(0, REPO)
    from semi_detr_tpu.data.synthetic import write_synthetic_coco

    n_sup = max(n_imgs // 5, 8)
    n_val = max(n_imgs // 10, 8)
    n_unsup = n_imgs - n_sup - n_val
    splits = {
        "sup": range(0, n_sup),
        "unsup": range(n_sup, n_sup + n_unsup),
        "val": range(n_sup + n_unsup, n_imgs),
    }
    # landscape COCO-ish aspect; the recipe's resize scales upsample to
    # the 800x1344 bucket exactly as with real data
    # distractor clutter + color jitter: without it the teacher overfits
    # the flat-color rectangles to max confidence and pseudo_per_img
    # pins at the max_pseudo cap, overstating stage-2 load vs real data
    paths, img_dir = write_synthetic_coco(
        root, n=n_imgs, hw=(480, 640), seed=0, splits=splits,
        n_classes=5, max_boxes=6, distractors=8)
    return paths, img_dir


def run_cli(cfg_path, work_dir, max_steps, paths, img_dir, extra=()):
    cmd = [
        sys.executable, os.path.join(REPO, "tools", "train_detr_ssod.py"),
        cfg_path, "--work-dir", work_dir, "--max-steps", str(max_steps),
        "--cfg-options",
        f"data.train_sup_ann={paths['sup']}",
        f"data.train_unsup_ann={paths['unsup']}",
        f"data.val_ann={paths['val']}",
        f"data.train_prefix={img_dir}",
        f"data.val_prefix={img_dir}",
        "data.classes=['person','class1','class2','class3','class4']",
        "model.num_classes=5",
        *extra,
    ]
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    t0 = time.time()
    r = subprocess.run(cmd, cwd=os.path.join(REPO, "tools"), env=env)
    if r.returncode != 0:
        raise SystemExit(f"training subprocess failed: {r.returncode}")
    return time.time() - t0


def analyze(work_dir, steps, stage_boundary, eval_interval):
    rows = []
    with open(os.path.join(work_dir, "metrics.jsonl")) as f:
        for line in f:
            rows.append(json.loads(line))
    times = [r["time"] for r in rows if r.get("step", 0) > 0]
    med = statistics.median(times) if times else float("nan")
    # "compile events": logged intervals > 5x the median per-step time
    spikes = [r["step"] for r in rows if r.get("time", 0) > 5 * med]

    log = open(os.path.join(work_dir, "train.log")).read()
    hbm = re.findall(r"hbm: (\{.*\})", log)
    evals = re.findall(r"Eval\[(teacher|student)\] iter (\d+): (.*)", log)
    resumed = re.findall(r"resumed from step (\d+)", log)
    return {
        "median_step_s": round(med, 3),
        "img_per_s_chip": round(5 / med, 3) if times else None,
        "steps_logged": len(rows),
        "compile_spike_steps": spikes,
        "hbm": hbm[-1] if hbm else None,
        "evals": [(t, int(s)) for t, s, _ in evals],
        "eval_lines": ["{}@{}: {}".format(t, s, d[:120])
                       for t, s, d in evals],
        "resumed_from": [int(s) for s in resumed],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--imgs", type=int, default=200)
    ap.add_argument("--workdir", default="/tmp/rehearsal")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "RECIPE_REHEARSAL.md"))
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    data_root = os.path.join(args.workdir, "data")
    paths, img_dir = build_dataset(data_root, args.imgs)

    work_dir = os.path.join(args.workdir, "run")
    cfg = os.path.join(REPO, "configs", "detr_ssod",
                       "semi_detr_r50_coco_120k.py")
    boundary = args.steps // 2
    eval_iv = max(args.steps // 3, 50)
    extra = (
        f"ssod.warm_up_step={boundary}",
        f"eval_interval={eval_iv}",
        f"ckpt_interval={max(args.steps // 4, 50)}",
        "image_log_interval=0",
        # flagship epoch semantics but a short stream for the rehearsal
        f"schedule.epoch_length={max(args.steps, 100)}",
    )

    # leg 1: fresh start, runs into the warm-up stage and checkpoints
    kill_at = args.steps // 2 + args.steps // 8
    t1 = run_cli(cfg, work_dir, kill_at, paths, img_dir, extra)
    # leg 2: resume from the work-dir checkpoint, cross into stage 2,
    # finish (exercises the auto-resume path the trainer CLI ships)
    t2 = run_cli(cfg, work_dir, args.steps, paths, img_dir, extra)

    a = analyze(work_dir, args.steps, boundary, eval_iv)
    a["wall_leg1_s"] = round(t1, 1)
    a["wall_leg2_s"] = round(t2, 1)

    with open(args.out, "w") as f:
        f.write(
            "# RECIPE REHEARSAL — flagship 120k config, synthetic data\n\n"
            f"Run: {time.strftime('%Y-%m-%d %H:%M')}, steps={args.steps}, "
            f"warm-up boundary={boundary}, eval_interval={eval_iv}, "
            f"dataset={args.imgs} synthetic 480x640 images "
            "(5 classes, <=6 boxes), full flagship model/bucket.\n\n"
            "Driven through `tools/train_detr_ssod.py` twice: leg 1 fresh "
            f"to step {kill_at} (stops mid-recipe), leg 2 auto-resumes "
            f"from the work-dir checkpoint and finishes at {args.steps} "
            "(crossing the warm-up stage boundary).\n\n"
            "```json\n" + json.dumps(a, indent=2) + "\n```\n\n"
            "Interpretation:\n"
            f"- median step {a['median_step_s']}s -> "
            f"{a['img_per_s_chip']} img/s/chip at the recipe batch (5).\n"
            f"- compile spikes at steps {a['compile_spike_steps']} "
            "(expected: step 0 of each leg + the stage boundary + first "
            "eval programs).\n"
            f"- resume points: {a['resumed_from']} (leg 2 must resume "
            "from leg 1's last checkpoint).\n"
            f"- HBM after step: {a['hbm']}\n"
            f"- evals ran: {a['evals']}\n")
    print(json.dumps(a, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
