"""COCO mAP evaluator tests: hand-checkable scenarios."""
import numpy as np

from semi_detr_tpu.data.coco_eval import box_iou_xyxy, coco_map


def _det(boxes, scores, labels):
    return (np.asarray(boxes, np.float32).reshape(-1, 4),
            np.asarray(scores, np.float32),
            np.asarray(labels, np.int64))


def _gt(boxes, labels, ignore=None):
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    labels = np.asarray(labels, np.int64)
    ig = (np.zeros(len(boxes), bool) if ignore is None
          else np.asarray(ignore, bool))
    return boxes, labels, ig


def test_iou_basic():
    a = np.asarray([[0, 0, 10, 10]], np.float32)
    b = np.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                   np.float32)
    iou = box_iou_xyxy(a, b)[0]
    assert abs(iou[0] - 1.0) < 1e-6
    assert abs(iou[1] - 25 / 175) < 1e-6
    assert iou[2] == 0


def test_perfect_detection_gives_ap_1():
    gt = {1: _gt([[10, 10, 50, 50]], [0])}
    det = {1: _det([[10, 10, 50, 50]], [0.9], [0])}
    res = coco_map(det, gt, num_classes=1)
    assert abs(res["mAP"] - 1.0) < 1e-6
    assert abs(res["mAP_50"] - 1.0) < 1e-6


def test_miss_gives_ap_0():
    gt = {1: _gt([[10, 10, 50, 50]], [0])}
    det = {1: _det([[200, 200, 240, 240]], [0.9], [0])}
    res = coco_map(det, gt, num_classes=1)
    assert res["mAP"] == 0.0


def test_half_precision():
    # 2 GTs, 1 matched at all IoU thrs + 1 FP with lower score:
    # precision at recall .5 is 1.0, recall never reaches 1 -> AP ~ 0.5
    gt = {1: _gt([[0, 0, 10, 10], [100, 100, 140, 140]], [0, 0])}
    det = {1: _det([[0, 0, 10, 10], [300, 300, 340, 340]], [0.9, 0.8],
                   [0, 0])}
    res = coco_map(det, gt, num_classes=1)
    assert abs(res["mAP_50"] - 0.5) < 0.02


def test_ignore_regions_not_counted():
    # detection on an ignore GT: neither TP nor FP
    gt = {1: _gt([[0, 0, 10, 10], [100, 100, 140, 140]], [0, 0],
                 [False, True])}
    det = {1: _det([[0, 0, 10, 10], [100, 100, 140, 140]], [0.9, 0.8],
                   [0, 0])}
    res = coco_map(det, gt, num_classes=1)
    assert abs(res["mAP"] - 1.0) < 1e-6


def test_localization_quality_spread():
    # IoU 0.6 match: counts at thr .5/.55/.6 only -> mAP ~ 3/10
    # box [0,0,10,6] vs [0,0,10,10]: iou = 60/100 = 0.6
    gt = {1: _gt([[0, 0, 10, 10]], [0])}
    det = {1: _det([[0, 0, 10, 6]], [0.9], [0])}
    res = coco_map(det, gt, num_classes=1)
    assert abs(res["mAP_50"] - 1.0) < 1e-6
    assert abs(res["mAP"] - 0.3) < 0.02
    assert res["mAP_75"] == 0.0


def test_multiclass_and_missing_class():
    gt = {1: _gt([[0, 0, 10, 10]], [0]), 2: _gt([[0, 0, 20, 20]], [1])}
    det = {1: _det([[0, 0, 10, 10]], [0.9], [0]),
           2: _det([[0, 0, 20, 20]], [0.9], [1])}
    res = coco_map(det, gt, num_classes=3,
                   class_names=["a", "b", "c"])
    assert abs(res["mAP"] - 1.0) < 1e-6  # class c has no GT -> excluded
    assert res["AP_per_class"]["c"] is None


def test_area_ranges():
    # small gt (16 area), large gt (200x200)
    gt = {1: _gt([[0, 0, 4, 4], [0, 0, 200, 200]], [0, 0])}
    det = {1: _det([[0, 0, 4, 4]], [0.9], [0])}
    res = coco_map(det, gt, num_classes=1)
    assert abs(res["mAP_s"] - 1.0) < 1e-6
    assert res["mAP_l"] == 0.0


def test_average_recall_maxdets():
    """AR@[1,10,100] (pycocotools summarize rows 7-9): two perfect dets
    on two GTs -> AR_1 = 0.5 (only the top-scored det counts), AR_10 =
    AR_100 = 1.0; area-split AR follows the GT sizes."""
    gt = {1: _gt([[0, 0, 10, 10], [20, 20, 30, 30]], [0, 0])}
    det = {1: _det([[0, 0, 10, 10], [20, 20, 30, 30]], [0.9, 0.8], [0, 0])}
    res = coco_map(det, gt, num_classes=1)
    assert abs(res["AR_1"] - 0.5) < 1e-6
    assert abs(res["AR_10"] - 1.0) < 1e-6
    assert abs(res["AR_100"] - 1.0) < 1e-6
    assert abs(res["AR_s"] - 1.0) < 1e-6    # both GTs are small-area
    assert np.isnan(res["AR_l"])            # no large GT -> excluded


def test_average_recall_localization():
    """A det at IoU 0.6 only recalls at thresholds .5/.55/.6 -> AR 0.3."""
    gt = {1: _gt([[0, 0, 10, 10]], [0])}
    det = {1: _det([[0, 0, 10, 6]], [0.9], [0])}
    res = coco_map(det, gt, num_classes=1)
    assert abs(res["AR_100"] - 0.3) < 1e-6


def test_segmentation_area_bucketing():
    """GT s/m/l bucketing uses ann['area'] (segmentation), not bbox area
    (pycocotools protocol)."""
    from semi_detr_tpu.data.coco_eval import coco_map
    # one GT: bbox 40x40 (=1600 px, 'medium' by bbox) but seg area 900
    # ('small'); detection matches it perfectly
    gt_b = np.asarray([[0, 0, 40, 40]], np.float32)
    gt_l = np.asarray([0])
    ig = np.zeros(1, bool)
    det = {1: (gt_b.copy(), np.asarray([0.9], np.float32),
               np.asarray([0]))}
    with_seg = coco_map(det, {1: (gt_b, gt_l, ig,
                                  np.asarray([900.0]))}, 1)
    no_seg = coco_map(det, {1: (gt_b, gt_l, ig)}, 1)
    assert with_seg["mAP_s"] == 1.0 and np.isnan(with_seg["mAP_m"])
    assert np.isnan(no_seg["mAP_s"]) and no_seg["mAP_m"] == 1.0


def test_area_ignored_noncrowd_gt_not_rematchable():
    """A non-crowd GT outside the area range is ignored but must NOT get
    crowd semantics: once matched it locks, and its IoU uses the normal
    union (pycocotools keys re-matching on iscrowd only)."""
    from semi_detr_tpu.data.coco_eval import coco_map
    # 'small' range eval: one medium GT (area-ignored), two identical
    # strong dets of MEDIUM size on it. With crowd semantics both would
    # match-and-ignore; correct behavior: first matches (ignored), the
    # second ALSO can't create an FP because unmatched out-of-range dets
    # are ignored — so construct the discriminating case with a SMALL
    # second det that overlaps the medium gt partially (IoU < thr under
    # true union, > thr under det-area 'crowd' IoU).
    gt_b = np.asarray([[0, 0, 60, 60]], np.float32)     # area 3600 medium
    gt_l = np.asarray([0])
    ig = np.zeros(1, bool)
    # det: 20x20 inside the gt: inter=400, union=3600+400-400=3600 ->
    # IoU 0.111; crowd IoU would be 400/400 = 1.0
    det = {1: (np.asarray([[0, 0, 20, 20]], np.float32),
               np.asarray([0.9], np.float32), np.asarray([0]))}
    res = coco_map(det, {1: (gt_b, gt_l, ig)}, 1)
    # small-range: the small det must be an unmatched FP (IoU too low),
    # and with zero small GTs mAP_s is NaN; under crowd semantics the
    # det would have matched-and-ignored instead. Discriminate via AR:
    # no recall entries either way, but the det stays a counted FP in
    # the 'all' range: mAP ('all') must be 0, not ignored-away.
    assert res["mAP"] == 0.0
