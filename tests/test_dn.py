"""Adaptive CDN layout: reference partition semantics under static shapes.

Reference `prepare_for_cdn_plus` (dn_components.py:128-275): single_pad =
batch max GT count, groups = 200 // (2*single_pad), pad_size =
2*single_pad*groups. models/dn.py reproduces that partition as traced
CONTENT inside a fixed `capacity = 2*dn_single_pad*dn_groups` slot budget.
"""
import jax
import jax.numpy as jnp
import numpy as np

from semi_detr_tpu.models.dn import (build_cdn_queries, cdn_attn_mask)

C = 16  # content dim for tests


def _build(counts, G, single_pad, groups, seed=0, num_classes=5):
    B = len(counts)
    rs = np.random.RandomState(seed)
    boxes = rs.uniform(0.3, 0.6, (B, G, 4)).astype(np.float32)
    labels = rs.randint(0, num_classes, (B, G)).astype(np.int32)
    valid = np.arange(G)[None] < np.asarray(counts)[:, None]
    label_enc = jnp.asarray(rs.randn(num_classes + 2, C).astype(np.float32))
    cdn = build_cdn_queries(
        jax.random.PRNGKey(seed), jnp.asarray(boxes), jnp.asarray(labels),
        jnp.asarray(valid), label_enc, num_classes, single_pad, groups)
    return cdn, boxes, labels, valid


def test_partition_matches_reference_formula():
    """capacity 200 (reference 2*dn_number): 7-GT batch -> single_pad 7,
    groups 200//14 = 14, active pad_size 196 — the reference's numbers."""
    cdn, *_ = _build([7, 3], G=100, single_pad=100, groups=1)
    assert int(cdn.single_pad) == 7
    assert int(cdn.groups) == 14
    assert int(cdn.slot_active.sum()) == 2 * 7 * 14
    # slot -> gt mapping: s % single_pad, chunks alternate pos/neg
    gt_idx = np.asarray(cdn.gt_idx)
    assert (gt_idx[:14] == np.arange(14) % 7).all()
    is_pos = np.asarray(cdn.is_positive)
    assert is_pos[:7].all() and not is_pos[7:14].any()
    assert is_pos[14:21].all()
    # inactive remainder carries nothing
    assert not is_pos[196:].any()
    assert not np.asarray(cdn.slot_valid)[:, 196:].any()


def test_heavy_gt_batch_keeps_all_gts():
    """90-GT image (COCO max ~93): every GT gets DN slots — the round-2
    static layout dropped GTs >= 32 (VERDICT missing #4)."""
    cdn, *_ = _build([90, 5], G=100, single_pad=100, groups=1)
    assert int(cdn.single_pad) == 90
    assert int(cdn.groups) == 1          # 200 // 180
    sv = np.asarray(cdn.slot_valid)
    # image 0: 90 valid slots in each of the 2 active chunks
    assert sv[0, :90].all() and sv[0, 90:180].all()
    assert not sv[0, 180:].any()
    # image 1: gt slots 0..4 of each chunk
    assert sv[1, :5].all() and not sv[1, 5:90].any()


def test_small_batch_gets_many_groups():
    """1-GT batch -> groups = capacity//2 noise groups of that one GT
    (reference supervision density), not the old fixed 3."""
    cdn, boxes, labels, _ = _build([1], G=8, single_pad=8, groups=2)  # cap 32
    assert int(cdn.single_pad) == 1 and int(cdn.groups) == 16
    assert int(cdn.slot_active.sum()) == 32
    assert bool(cdn.slot_valid.all())
    # positive chunks: even slots (chunk size 1)
    is_pos = np.asarray(cdn.is_positive)
    assert (is_pos == (np.arange(32) % 2 == 0)).all()


def test_empty_image_fake_injection():
    cdn, *_ = _build([0, 2], G=8, single_pad=8, groups=2)
    assert bool(cdn.pad_mask[0]) and not bool(cdn.pad_mask[1])
    assert int(cdn.single_pad) == 2      # max(counts after fake inject)=2
    sv = np.asarray(cdn.slot_valid)
    assert sv[0, 0] and not sv[0, 1]     # fake occupies gt slot 0 only
    # fake content is real embedding rows (nonzero)
    assert np.abs(np.asarray(cdn.query_label)[0, 0]).sum() > 0


def test_negative_chunks_pushed_outside_box():
    """Negative noise part is in [1, 2) x half-extent x scale: negatives
    land strictly outside the positive noise band (reference :206-223)."""
    cdn, boxes, _, _ = _build([4], G=4, single_pad=4, groups=2, seed=3)
    sp = int(cdn.single_pad)
    q = np.asarray(jax.nn.sigmoid(cdn.query_bbox))   # noised cxcywh
    gt = boxes[0, :sp]
    # corner-space distance from the gt corners, normalized by half-extent
    def corner_dist(slot_q, slot_gt):
        qc = np.concatenate([slot_q[:2] - slot_q[2:] / 2,
                             slot_q[:2] + slot_q[2:] / 2])
        gc = np.concatenate([slot_gt[:2] - slot_gt[2:] / 2,
                             slot_gt[:2] + slot_gt[2:] / 2])
        half = np.concatenate([slot_gt[2:] / 2, slot_gt[2:] / 2])
        return np.abs(qc - gc) / (half * 0.4)        # box_noise_scale=.4
    for j in range(sp):
        dpos = corner_dist(q[0, j], gt[j])           # chunk 0 = positive
        dneg = corner_dist(q[0, sp + j], gt[j])      # chunk 1 = negative
        assert (dpos <= 1.0 + 1e-4).all()
        # negatives: every corner is in [1, 2) UNLESS the [0,1] clamp bit
        # — a clamped corner sits exactly on the image boundary, so mask
        # those and require the bound on the rest (strictly, not `or True`)
        qn = q[0, sp + j]
        qc = np.concatenate([qn[:2] - qn[2:] / 2, qn[:2] + qn[2:] / 2])
        unclamped = (qc > 1e-6) & (qc < 1.0 - 1e-6)
        assert (dneg[unclamped] >= 1.0 - 1e-4).all()
        assert dneg.max() > 1.0 - 1e-4               # at least one outside


def test_attn_mask_group_isolation_static_and_adaptive():
    # static: int args, capacity = 2*sp*groups (old behavior)
    m = np.asarray(cdn_attn_mask(2, 2, 3))
    pad = 8
    assert m.shape == (11, 11)
    assert m[pad:, :pad].all()            # matching blocked from dn
    assert not m[pad:, pad:].any()        # matching sees matching
    assert not m[:pad, pad:].any()        # dn sees matching
    for g, (s, e) in enumerate(((0, 4), (4, 8))):
        assert not m[s:e, s:e].any()      # own group visible
        other = np.ones(pad, bool)
        other[s:e] = False
        assert m[s:e, :pad][:, other].all()

    # adaptive: traced-style partition inside a larger capacity
    m2 = np.asarray(cdn_attn_mask(jnp.int32(2), jnp.int32(2), 3,
                                  capacity=12))
    assert m2.shape == (15, 15)
    assert not m2[0:4, 0:4].any() and not m2[4:8, 4:8].any()
    assert m2[0:4, 4:8].all() and m2[4:8, 0:4].all()
    # inactive slots 8..11: isolated from every other dn slot
    for s in range(8, 12):
        row = m2[s, :12].copy()
        row[s] = True                      # self always allowed
        assert row[np.arange(12) != s].all()
        assert m2[:8, s].all()             # nothing active attends to them
    assert m2[12:, :12].all()              # matching blocked from all dn


def test_combined_attn_mask_adaptive_dn_block():
    from semi_detr_tpu.models.ssod import combined_attn_mask
    m = np.asarray(combined_attn_mask(6, 2, jnp.int32(2), jnp.int32(2), 4,
                                      dn_capacity=12))
    front = 6 + 12
    assert m.shape == (front + 4, front + 4)
    # consistency groups [0:3), [3:6) isolated from each other and from dn
    assert not m[0:3, 0:3].any() and m[0:3, 3:6].all()
    assert m[0:3, 6:front].all() and m[6:10, 0:6].all()
    # dn groups at offset 6: [6:10), [10:14) see only themselves
    assert not m[6:10, 6:10].any() and m[6:10, 10:14].all()
    # matching blocked from the whole front, front sees matching
    assert m[front:, :front].all() and not m[:front, front:].any()


def test_combined_attn_mask_adaptive_consistency_block():
    """Adaptive consistency partition (traced cons_single_pad): active
    chunks isolated per group, slots past groups*single_pad fully
    isolated, no id collision with any dn group."""
    from semi_detr_tpu.models.ssod import combined_attn_mask
    m = np.asarray(combined_attn_mask(6, 2, jnp.int32(2), jnp.int32(2), 4,
                                      dn_capacity=12,
                                      cons_single_pad=jnp.int32(2)))
    front = 6 + 12
    assert m.shape == (front + 4, front + 4)
    # active consistency chunks [0:2), [2:4) see only themselves
    assert not m[0:2, 0:2].any() and not m[2:4, 2:4].any()
    assert m[0:2, 2:4].all() and m[2:4, 0:2].all()
    # inactive consistency slots 4,5: isolated from everything active
    for s in (4, 5):
        row = m[s, :front].copy()
        row[s] = True
        assert row[np.arange(front) != s].all()
        assert m[0:4, s].all() and m[6:front, s].all()
    # consistency never collides with dn groups (active dn [6:10),[10:14))
    assert m[0:4, 6:front].all() and m[6:14, 0:6].all()
    assert not m[6:10, 6:10].any() and m[6:10, 10:14].all()
    # matching blocked from the whole front, front sees matching
    assert m[front:, :front].all() and not m[:front, front:].any()


def test_dn_layer_loss_targets_adaptive_layout():
    """_dn_layer_loss x adaptive CdnBatch: positives reconstruct their GT,
    negatives are background-supervised, inactive slots and no-GT images
    carry zero weight (reference _get_target_single_dn,
    dino_detr_ssod_head.py:885-957)."""
    from semi_detr_tpu.models.criterion import _dn_layer_loss

    B, G, K = 2, 4, 3
    rs = np.random.RandomState(0)
    gt = {"boxes": jnp.asarray(rs.rand(B, G, 4) * 0.3 + 0.3,
                               jnp.float32),
          "labels": jnp.asarray(rs.randint(0, K, (B, G)), jnp.int32),
          # image 0: 2 GTs; image 1: none
          "valid": jnp.asarray([[True, True, False, False],
                                [False, False, False, False]])}
    label_enc = jnp.asarray(rs.randn(K + 2, 8), jnp.float32)
    cdn = build_cdn_queries(jax.random.PRNGKey(0), gt["boxes"],
                            gt["labels"], gt["valid"], label_enc, K,
                            single_pad=4, groups=2)     # capacity 16
    # batch max = 2 -> sp_dyn 2, groups_dyn 4, all 16 slots active
    assert int(cdn.single_pad) == 2 and int(cdn.groups) == 4
    pad = cdn.gt_idx.shape[0]
    cls = jnp.asarray(rs.randn(B, pad, K), jnp.float32)
    coord = jnp.asarray(rs.rand(B, pad, 4) * 0.5 + 0.25, jnp.float32)
    out = _dn_layer_loss(cls, coord, gt, cdn, K, None, "")
    for k, v in out.items():
        assert np.isfinite(float(v)), k
    assert float(out["dn_loss_cls"]) > 0

    # zero out image 0's GTs too -> only fake dn remains -> no dn loss
    gt0 = dict(gt, valid=jnp.zeros((B, G), bool))
    cdn0 = build_cdn_queries(jax.random.PRNGKey(0), gt0["boxes"],
                             gt0["labels"], gt0["valid"], label_enc, K,
                             single_pad=4, groups=2)
    assert bool(cdn0.pad_mask.all())
    out0 = _dn_layer_loss(cls, coord, gt0, cdn0, K, None, "")
    assert float(out0["dn_loss_cls"]) == 0.0
    assert float(out0["dn_loss_bbox"]) == 0.0


def test_dn_inactive_slots_zero_weight():
    """A 3-GT batch in a 16-slot budget leaves 16 - 2*3*2 = 4 inactive
    slots; their loss weight must be exactly zero."""
    from semi_detr_tpu.models.criterion import _dn_layer_loss

    B, G, K = 1, 8, 2
    rs = np.random.RandomState(1)
    gt = {"boxes": jnp.asarray(rs.rand(B, G, 4) * 0.3 + 0.3, jnp.float32),
          "labels": jnp.zeros((B, G), jnp.int32),
          "valid": jnp.asarray([[True] * 3 + [False] * 5])}
    label_enc = jnp.asarray(rs.randn(K + 2, 8), jnp.float32)
    cdn = build_cdn_queries(jax.random.PRNGKey(1), gt["boxes"],
                            gt["labels"], gt["valid"], label_enc, K,
                            single_pad=4, groups=2)
    assert int(cdn.single_pad) == 3 and int(cdn.groups) == 2
    assert int(cdn.slot_active.sum()) == 12
    pad = cdn.gt_idx.shape[0]
    # two loss evaluations differing ONLY in the inactive slots' preds
    cls_a = jnp.asarray(rs.randn(B, pad, K), jnp.float32)
    coord_a = jnp.asarray(rs.rand(B, pad, 4) * 0.5 + 0.25, jnp.float32)
    bump = (~np.asarray(cdn.slot_active))[None, :, None]
    cls_b = cls_a + jnp.asarray(bump * 5.0, jnp.float32)
    coord_b = jnp.clip(coord_a + jnp.asarray(bump * 0.2, jnp.float32),
                       0, 1)
    out_a = _dn_layer_loss(cls_a, coord_a, gt, cdn, K, None, "")
    out_b = _dn_layer_loss(cls_b, coord_b, gt, cdn, K, None, "")
    for k in out_a:
        np.testing.assert_allclose(float(out_a[k]), float(out_b[k]),
                                   rtol=1e-6, err_msg=k)


def test_compact_gt_covers_scattered_filtered_sets():
    """Filtered pseudo-label keep masks are scattered; compact_gt must
    prefix-pack them so EVERY kept gt owns dn slots (the slot->gt map is
    `s % single_pad_dyn` — a kept box at slot >= single_pad_dyn would
    silently lose dn supervision without compaction)."""
    from semi_detr_tpu.models.dn import compact_gt

    boxes = jnp.asarray(
        np.stack([np.full((4,), 0.1 * (i + 1), np.float32)
                  for i in range(4)])[None])              # (1, 4, 4)
    labels = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
    valid = jnp.asarray([[False, True, False, True]])

    b, l, v = compact_gt(boxes, labels, valid)
    # packed: kept entries 1 and 3 at the front, stable order
    assert np.asarray(v).tolist() == [[True, True, False, False]]
    np.testing.assert_allclose(np.asarray(b)[0, 0], 0.2)
    np.testing.assert_allclose(np.asarray(b)[0, 1], 0.4)
    assert np.asarray(l)[0, :2].tolist() == [1, 3]
    # invalid tail zeroed
    assert (np.asarray(b)[0, 2:] == 0).all()

    # end-to-end: after compaction the adaptive layout covers both kept
    # gts (single_pad_dyn == 2); with the raw scattered mask it would
    # have covered gt index {0, 1} -> only original gt 1
    label_enc = jnp.asarray(np.random.RandomState(0)
                            .randn(6, C).astype(np.float32))
    cdn = build_cdn_queries(jax.random.PRNGKey(0), b, l, v, label_enc,
                            4, single_pad=4, groups=2)
    assert int(cdn.single_pad) == 2
    covered = set(np.asarray(cdn.gt_idx)[np.asarray(cdn.slot_active)
                                         & np.asarray(cdn.slot_valid)[0]]
                  .tolist())
    assert covered == {0, 1}  # == original kept gts {1, 3} after packing

    # already-packed input is a no-op (the supervised path is unchanged)
    pb, plb, pv = compact_gt(boxes, labels,
                             jnp.asarray([[True, True, False, False]]))
    np.testing.assert_array_equal(np.asarray(pv),
                                  [[True, True, False, False]])
    np.testing.assert_allclose(np.asarray(pb)[0, :2],
                               np.asarray(boxes)[0, :2])
