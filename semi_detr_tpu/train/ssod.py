"""Semi-supervised train step — the whole Semi-DETR iteration in one jit.

Orchestrates the reference's per-iteration hot loop (SURVEY.md §3.1:
MeanTeacher EMA -> teacher pseudo-labeling -> cross-view transform ->
Hungarian+GMM dual filter -> CDN/consistency query construction -> student
fwd/bwd -> teacher consistency fwd -> AdamW) as a single compiled XLA
program over a `data` mesh.

Stage switching (`warm_up`) is static: one recompile at the warm-up
boundary replaces the reference's `in_warm_up` runtime flag
(`dino_detr_ssod_head.py:238-241`, `dino_detr_ssod.py:357-360`).

Loss naming mirrors the reference (`sup_`/`unsup_` prefixes,
`weighted_loss` scaling of every 'loss' key by unsup_weight — reference
`dino_detr_ssod.py:136-150`, `structure_utils.py:127-153`).
"""
from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

# Fused sup+unsup encode: OFF by default since round 5. The round-5
# on-chip bisection (ROADMAP "Round 5 — BENCH_r04 kernel-fault root
# cause") pinned the BENCH_r04 "TPU worker process crashed" fault on
# this fusion (crash with it on, clean 3.45 img/s with it off, fake-RoI
# leg exonerated); until the Mosaic/XLA interaction is understood it is
# opt-in via SDT_FUSED_ENCODE=1.
_FUSED_ENCODE = os.environ.get("SDT_FUSED_ENCODE", "0") == "1"
# fault-bisection kill switch (default ON = landed r4 behavior; the
# bisection exonerated this one)
_FAKE_CONS_ROI = os.environ.get("SDT_FAKE_CONS_ROI", "1") != "0"

from ..models.criterion import detection_loss
from ..models.dino_head import DINODetector
from ..models.dn import (build_cdn_queries, cdn_attn_mask, compact_gt,
                         pack_order)
from ..models.ssod import (Projector, SsodConfig, combined_attn_mask,
                           consistency_loss, consistency_partition,
                           consistency_positions,
                           decode_pseudo_labels, dual_filter,
                           inject_fake_consistency_roi,
                           normalize_boxes, pseudo_matching_costs,
                           scatter_to_slots,
                           transform_pseudo_to_student)
from ..ops.gmm import fit_gmm_threshold
from ..ops.roi_align import multi_level_roi_align
from .state import TrainState, copy_tree, ema_momentum, ema_update


def _slice_enc(enc, lo, hi):
    """Slice every batch-axis leaf of an encode_images dict (all leaves
    are batch-first; 'spatial_shapes' is static metadata)."""
    sp = enc["spatial_shapes"]
    rest = {k: v for k, v in enc.items() if k != "spatial_shapes"}
    out = jax.tree.map(lambda x: x[lo:hi], rest)
    out["spatial_shapes"] = sp
    return out


def _unsup_forward_and_loss(detector: DINODetector, projector: Projector,
                            params, batch_stats, teacher_params,
                            batch: Dict[str, Any], rng, cfg: SsodConfig,
                            warm_up: bool, s_enc=None):
    """Unsupervised branch: returns dict of losses (unweighted).

    s_enc: optional precomputed student encode of the unlabeled strong
    view (from the fused sup+unsup encoder pass in make_ssod_train_step).
    """
    c = cfg.dino
    un = batch["unsup"]
    student_vars = {"params": params["detector"], "batch_stats": batch_stats}
    teacher_vars = {"params": teacher_params, "batch_stats": batch_stats}
    rng_dn1, rng_dn2 = jax.random.split(rng)

    # ---- teacher: encoder once, pseudo-label decode (all constants w.r.t.
    # params; reference extract_teacher_info, dino_detr_ssod.py:893-951)
    t_enc = detector.apply(teacher_vars, un["teacher_images"],
                           un["teacher_hw"],
                           method=DINODetector.encode_images)
    t_match = detector.apply(teacher_vars, t_enc,
                             method=DINODetector.decode_queries)
    pl = decode_pseudo_labels(t_match["cls"][-1], t_match["coord"][-1],
                              un["teacher_hw"], cfg)
    pl = transform_pseudo_to_student(pl, un["teacher_tmat"],
                                     un["student_tmat"], un["student_hw"])
    pl = jax.tree.map(jax.lax.stop_gradient, pl)
    pl_norm_s = normalize_boxes(pl.boxes_s, un["student_hw"])

    # ---- student: encoder ONCE; matching decode is fully detached at the
    # cost computation so no backward graph is built for it
    if s_enc is None:
        s_enc = detector.apply(student_vars, un["student_images"],
                               un["student_hw"],
                               method=DINODetector.encode_images)
    s_match = detector.apply(student_vars, s_enc,
                             method=DINODetector.decode_queries)
    costs = pseudo_matching_costs(s_match["cls"][-1], s_match["coord"][-1],
                                  pl_norm_s, pl.labels, pl.valid)

    # ---- GMM threshold on the GLOBAL cost pool (reference all-gathers,
    # :296-315; in global view the batch axis is already global)
    gmm_thr = fit_gmm_threshold(costs.reshape(-1), pl.valid.reshape(-1))
    keep_sup, keep_cons = dual_filter(costs, pl.scores, pl.valid, gmm_thr,
                                      cfg.score_thr)

    # prefix-pack the kept set: dual_filter masks are scattered over the
    # pseudo slots, but the cdn slot->gt layout (and nothing else — the
    # matching losses are permutation-invariant) requires packed validity
    sup_boxes, sup_labels, sup_valid = compact_gt(pl_norm_s, pl.labels,
                                                  keep_sup)
    unsup_gt = {"boxes": sup_boxes, "labels": sup_labels,
                "valid": sup_valid}

    # ---- CDN (v1, student view) on the supervision set
    cdn = build_cdn_queries(
        rng_dn1, unsup_gt["boxes"], unsup_gt["labels"], unsup_gt["valid"],
        params["detector"]["label_enc"], c.num_classes, c.dn_single_pad,
        c.dn_groups, c.dn_label_noise_ratio, c.dn_box_noise_scale)

    out_losses: Dict[str, Any] = {}
    if warm_up:
        # empty-image fake center RoI (see inject_fake_consistency_roi)
        b, p = pl.valid.shape
        if _FAKE_CONS_ROI:
            keep_known, boxes_t, boxes_s = inject_fake_consistency_roi(
                keep_cons, pl.boxes_t, pl.boxes_s,
                un["teacher_hw"], un["student_hw"])
        else:           # bisection knob: pre-round-4 behavior
            keep_known, boxes_t, boxes_s = (keep_cons, pl.boxes_t,
                                            pl.boxes_s)

        # consistency content: RoIAlign teacher srcs at TEACHER-frame boxes
        # -> Projector (trainable); reference :563-607
        roi = jax.vmap(
            lambda feats, rois: multi_level_roi_align(feats, rois)
        )(tuple(jax.lax.stop_gradient(s) for s in t_enc["srcs"]),
          boxes_t)                                        # (B, P, 7, 7, C)
        content = projector.apply(
            {"params": params["projector"]},
            roi.reshape(b * p, *roi.shape[2:]), keep_known.reshape(-1))
        content = content.reshape(b, p, -1)
        content = jnp.where(keep_known[..., None], content, 0.0)

        # pack the kept slots to the front (the same stable order
        # compact_gt gives the teacher-view CDN) and size the consistency
        # groups to the batch max kept count — the reference's
        # single_pad_1 = max(known_num) (dino_detr_ssod.py:537), realized
        # as traced content in the static cons_pad budget
        order = pack_order(keep_known)
        packed_keep = jnp.take_along_axis(keep_known, order, axis=1)
        packed_content = jnp.take_along_axis(content, order[..., None],
                                             axis=1)
        packed_boxes_s = jnp.take_along_axis(boxes_s, order[..., None],
                                             axis=1)
        packed_boxes_t = jnp.take_along_axis(boxes_t, order[..., None],
                                             axis=1)
        cons_sp, slot_idx, slot_w = consistency_partition(
            packed_keep, cfg.cons_groups, cfg.cons_pad)
        # loss weights exclude the fake slots (reference loss_weights=0
        # for the injected fallback box, :577-581)
        packed_loss = jnp.take_along_axis(keep_cons, order, axis=1)
        loss_w = jnp.take(packed_loss, slot_idx, axis=1) & slot_w
        content_slots = scatter_to_slots(packed_content, slot_idx, slot_w)

        pos_s = consistency_positions(packed_boxes_s, un["student_hw"],
                                      slot_w, slot_idx)
        attn_mask = combined_attn_mask(cfg.cons_pad, cfg.cons_groups,
                                       cdn.single_pad, cdn.groups,
                                       c.num_queries,
                                       dn_capacity=c.dn_pad_size,
                                       cons_single_pad=cons_sp)
        extra_tgt = jnp.concatenate([content_slots, cdn.query_label], 1)
        extra_ref = jnp.concatenate([pos_s, cdn.query_bbox], 1)
    else:
        attn_mask = cdn_attn_mask(cdn.single_pad, cdn.groups,
                                  c.num_queries, capacity=c.dn_pad_size)
        extra_tgt, extra_ref = cdn.query_label, cdn.query_bbox

    s_out = detector.apply(student_vars, s_enc, extra_tgt, extra_ref,
                           attn_mask, cdn,
                           method=DINODetector.decode_queries)

    # split off the consistency block so the criterion sees [dn | matching]
    n_cons = cfg.cons_pad if warm_up else 0
    crit_out = dict(s_out)
    if n_cons:
        crit_out["front_cls"] = s_out["front_cls"][:, :, n_cons:]
        crit_out["front_coord"] = s_out["front_coord"][:, :, n_cons:]

    out_losses.update(detection_loss(
        crit_out, unsup_gt, c.num_classes, warm_up,
        is_pseudo_label=True,
        cls_group=cfg.cls_avg_groups[1] if cfg.cls_avg_groups else None))
    out_losses.pop("total")

    if warm_up:
        # ---- teacher consistency forward (v2): same content queries,
        # teacher-frame positions, CDN from teacher-frame boxes (:446-456)
        pl_norm_t = normalize_boxes(pl.boxes_t, un["teacher_hw"])
        t_boxes, t_labels, t_valid = compact_gt(pl_norm_t, pl.labels,
                                                keep_cons, order=order)
        cdn2 = build_cdn_queries(
            rng_dn2, t_boxes, t_labels, t_valid,
            jax.lax.stop_gradient(params["detector"]["label_enc"]),
            c.num_classes, c.dn_single_pad, c.dn_groups,
            c.dn_label_noise_ratio, c.dn_box_noise_scale)
        pos_t = consistency_positions(packed_boxes_t, un["teacher_hw"],
                                      slot_w, slot_idx)
        # cdn2's adaptive partition can differ from cdn's (different
        # filtered sets), so the teacher pass gets its own mask; the
        # consistency partition is shared (same keep_cons set)
        attn_mask2 = combined_attn_mask(cfg.cons_pad, cfg.cons_groups,
                                        cdn2.single_pad, cdn2.groups,
                                        c.num_queries,
                                        dn_capacity=c.dn_pad_size,
                                        cons_single_pad=cons_sp)
        t_out = detector.apply(
            teacher_vars, t_enc,
            jnp.concatenate([jax.lax.stop_gradient(content_slots),
                             cdn2.query_label], 1),
            jnp.concatenate([pos_t, cdn2.query_bbox], 1),
            attn_mask2, method=DINODetector.decode_queries)

        cons_counts = jnp.maximum(keep_cons.sum(-1), 1)
        out_losses.update(consistency_loss(
            s_out["hs"][:, :, :n_cons], t_out["hs"][:, :, :n_cons],
            loss_w, cons_counts, cfg, cfg.consistency_weight))

    metrics = {
        "pseudo_per_img": pl.valid.sum() / pl.valid.shape[0],
        "sup_set_per_img": keep_sup.sum() / pl.valid.shape[0],
        "cons_set_per_img": keep_cons.sum() / pl.valid.shape[0],
        "gmm_thr": gmm_thr,
        # first image's pseudo labels in the student frame, for the
        # throttled in-training visualization (reference
        # `log_image_with_boxes`, detr_ssod/utils/logger.py:91-161);
        # a few KB per step, popped by the trainer before scalar logging
        "pseudo_vis": {
            "boxes": pl.boxes_s[0], "labels": pl.labels[0],
            "scores": pl.scores[0], "keep": keep_sup[0],
        },
    }
    return out_losses, metrics


def make_ssod_train_step(detector: DINODetector, projector: Projector,
                         tx: optax.GradientTransformation, cfg: SsodConfig,
                         warm_up: bool, mesh=None, donate: bool = False,
                         state_sharding=None):
    """Returns step(state, batch, rng) -> (state, metrics).

    batch = {
      "sup":   {images (Bs,H,W,3), img_hw (Bs,2),
                gt: {boxes, labels, valid}},
      "unsup": {student_images (Bu,H,W,3), student_hw, student_tmat (Bu,3,3),
                teacher_images (Bu,H',W',3), teacher_hw, teacher_tmat},
    }
    state.params = {"detector": ..., "projector": ...};
    state.teacher_params = detector params copy.
    """
    c = cfg.dino

    def step_fn(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        teacher = ema_update(state.teacher_params, state.params["detector"],
                             state.step, cfg.ema_momentum,
                             decay_intervals=cfg.ema_decay_intervals,
                             decay_factor=cfg.ema_decay_factor)
        rng_sup, rng_unsup = jax.random.split(
            jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            losses: Dict[str, Any] = {}
            student_vars = {"params": params["detector"],
                            "batch_stats": state.batch_stats}
            sup_imgs, sup_hw = batch["sup"]["images"], batch["sup"]["img_hw"]
            un = batch["unsup"]
            enc_sup = enc_unsup = None
            if (_FUSED_ENCODE
                    and sup_imgs.shape[1:] == un["student_images"].shape[1:]):
                # fuse the (small, often 1-image) supervised encode into
                # the unlabeled strong-view encode: ONE backbone+encoder
                # pass over Bs+Bu images. Mathematically exact — every
                # op up to the encode outputs is per-image (frozen-BN
                # backbone, GN, per-image attention/top-k); batched
                # convs reorder f32 reductions for ~1e-6 rel drift
                # (tested in test_train_components). Falls back to two
                # passes when the buckets differ (multi-bucket steps).
                bs_n = sup_imgs.shape[0]
                enc_all = detector.apply(
                    student_vars,
                    jnp.concatenate([sup_imgs, un["student_images"]], 0),
                    jnp.concatenate([sup_hw, un["student_hw"]], 0),
                    method=DINODetector.encode_images)
                enc_sup = _slice_enc(enc_all, 0, bs_n)
                enc_unsup = _slice_enc(enc_all, bs_n, None)
            sup_out = detector.apply(
                student_vars, sup_imgs, sup_hw,
                gt=batch["sup"]["gt"], dn_rng=rng_sup, enc=enc_sup)
            sup_losses = detection_loss(
                sup_out, batch["sup"]["gt"], c.num_classes, warm_up,
                cls_group=(cfg.cls_avg_groups[0]
                           if cfg.cls_avg_groups else None))
            sup_losses.pop("total")
            losses.update({f"sup_{k}": v for k, v in sup_losses.items()})

            unsup_losses, metrics = _unsup_forward_and_loss(
                detector, projector, params, state.batch_stats, teacher,
                batch, rng_unsup, cfg, warm_up, s_enc=enc_unsup)
            losses.update({f"unsup_{k}": cfg.unsup_weight * v
                           for k, v in unsup_losses.items()})
            total = sum(v for k, v in losses.items() if "loss" in k)
            return total, (losses, metrics)

        (total, (losses, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        metrics.update(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        # reference logs the effective momentum each iter (mean_teacher.py:49)
        metrics["ema_momentum"] = ema_momentum(
            state.step, cfg.ema_momentum,
            decay_intervals=cfg.ema_decay_intervals,
            decay_factor=cfg.ema_decay_factor)
        new_state = state.replace(step=state.step + 1, params=params,
                                  teacher_params=teacher,
                                  opt_state=opt_state)
        return new_state, metrics

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        # state_sharding: replicated by default, or the per-leaf FSDP
        # tree from parallel.fsdp_sharding (params/opt/teacher sharded)
        st = state_sharding if state_sharding is not None else repl
        return jax.jit(step_fn,
                       in_shardings=(st, data, repl),
                       out_shardings=(st, repl),
                       donate_argnums=(0,) if donate else ())
    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def init_ssod_state(detector: DINODetector, projector: Projector,
                    tx: optax.GradientTransformation, cfg: SsodConfig,
                    rng, sample_images, sample_hw) -> TrainState:
    """Initialize {detector, projector} params + EMA teacher + optimizer."""
    dvars = detector.init({"params": rng}, sample_images, sample_hw)
    p = cfg.max_pseudo
    proj_rng = jax.random.fold_in(rng, 1)
    pvars = projector.init({"params": proj_rng},
                           jnp.zeros((p, 7, 7, cfg.dino.d_model)),
                           jnp.ones((p,), bool))
    params = {"detector": dvars["params"], "projector": pvars["params"]}
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=dvars.get("batch_stats", {}),
        teacher_params=copy_tree(dvars["params"]),
        opt_state=tx.init(params),
    )
