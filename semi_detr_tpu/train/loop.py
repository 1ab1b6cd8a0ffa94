"""Training loops — supervised and semi-supervised drivers.

The TPU-native analog of the reference runner stack (SURVEY.md §3.1:
IterBasedRunner + hooks). Hook behavior is inlined into a plain loop:
* EMA update + step record live INSIDE the jitted train step;
* eval every `eval_interval` on teacher AND student
  (SubModulesDistEvalHook), checkpoint every `ckpt_interval` keep-5,
  text/TB logging, weight summary at start;
* the warm-up -> main stage flip recompiles the step once at the boundary
  (the reference flips `in_warm_up` at runtime,
  `dino_detr_ssod.py:357-360`).
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.augment import COCO_SCALES
from ..data.pipeline import make_sup_batch, make_unsup_batch, \
    pick_step_bucket
from ..data.sampler import SemiBalanceSampler
from ..models.dino_head import DinoConfig, DINODetector
from ..models.inference import evaluate_teacher_and_student
from ..models.ssod import Projector, SsodConfig
from ..parallel import fsdp_sharding, make_mesh, shard_batch, tp_sharding
from ..utils.logging import (MetricsLogger, device_memory_summary,
                             get_logger, log_image_with_boxes,
                             weight_summary)
from . import optim
from .checkpoint import CheckpointManager
from .ssod import init_ssod_state, make_ssod_train_step
from .state import TrainState
from .supervised import make_supervised_train_step


def _build_mesh(use_mesh: bool, tp: int = 1):
    """1-D `data` mesh, or a 2-D (data, model) mesh when tensor
    parallelism is requested (`tp` devices per model shard; the batch
    stays sharded over `data` only)."""
    n = len(jax.devices())
    if not use_mesh or n <= 1:
        assert tp <= 1, "tp>1 needs a multi-device mesh"
        return None
    if tp > 1:
        assert n % tp == 0, (n, tp)
        return make_mesh((n // tp, tp))
    return make_mesh()


def _state_sharding(mesh, state, fsdp: bool, tp: int = 1):
    """Replicated / FSDP / TP / FSDP+TP state sharding tree (TP wins on
    the FFN leaves it shards; everything else takes the base)."""
    if mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P
    base = (fsdp_sharding(mesh, state) if fsdp
            else NamedSharding(mesh, P()))
    if tp > 1:
        return tp_sharding(mesh, state, base=base)
    return base


def _pad_indices(idx, n):
    idx = list(idx)
    while len(idx) < n:
        idx.append(idx[-1] if idx else 0)
    return idx[:n]


def _bucket_for_flag(bucket, flag):
    """Aspect-ratio group -> bucket orientation: flag 1 = landscape
    (w > h) uses (H, W); flag 0 = portrait uses the transposed bucket."""
    h, w = bucket
    land = (h, w) if w >= h else (w, h)
    return land if flag == 1 else (land[1], land[0])


def prefetch(iterator, depth: int = 2, transform=None):
    """Background-thread batch prefetch: overlaps host-side decoding/
    augmentation/packing with device steps (the torch-DataLoader-worker
    role; image decode itself is the native C++ loader).

    transform: optional callable applied to each item IN THE WORKER —
    the trainers pass their device_put/shard_batch here so the
    host->device transfer of step N+1 overlaps step N's device compute
    (torch's pin_memory+non_blocking role). JAX transfers are
    thread-safe; a transform exception re-raises in the consumer.

    Worker exceptions re-raise in the consumer (a swallowed loader error
    would silently truncate training as a clean end-of-stream), and
    abandoning the generator (loop break) unblocks and stops the worker
    instead of leaking it parked on a full queue of batches."""
    q = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _END = object()

    def worker():
        try:
            for item in iterator:
                if transform is not None:
                    item = transform(item)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.5)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            q.put(_END)
        except BaseException as e:                      # noqa: BLE001
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


# Overlap host->device batch transfer with device compute by doing the
# device_put inside the prefetch worker thread (the uint8 batches from
# data/pipeline.py keep the shipped bytes 4x down). SDT_PREFETCH_PUT=0
# restores the synchronous put-at-dispatch behavior.
_PREFETCH_PUT = os.environ.get("SDT_PREFETCH_PUT", "1") != "0"


def _batch_put(mesh, vis: bool = False):
    """Worker-thread transfer for prefetch(): ship each batch to device
    (sharded over the mesh when given). vis=True stashes a host copy of
    the first unlabeled student image under '_vis_img' (the pseudo-label
    render source) before the tree leaves the host. Returns None when
    prefetch-put is disabled."""
    if not _PREFETCH_PUT:
        return None

    def put(batch):
        vis_img = (np.asarray(batch["unsup"]["student_images"][0])
                   if vis else None)
        batch = (shard_batch(batch, mesh) if mesh is not None
                 else jax.device_put(batch))
        if vis_img is not None:
            batch["_vis_img"] = vis_img
        return batch

    return put


class SsodTrainer:
    """Semi-supervised trainer: COCO-partial 120k-style recipe."""

    def __init__(self, cfg: SsodConfig, sup_dataset, unsup_dataset,
                 val_dataset=None, work_dir: str = "work_dir",
                 total_steps: int = 120000,
                 lr: float = 1e-4, lr_boundaries=(),
                 samples_per_batch: int = 5, sample_ratio=(1, 4),
                 eval_interval: int = 4000, ckpt_interval: int = 4000,
                 bucket=(800, 1344), scales=None, seed: int = 0,
                 use_mesh: bool = True, backbone_init: Optional[str] = None,
                 load_from: Optional[str] = None,
                 multi_bucket: bool = False,
                 epoch_length: int = 7330,
                 image_log_interval: int = 2000,
                 fsdp: bool = False, tp: int = 1,
                 donate: bool = False,
                 by_prob: bool = False,
                 use_wandb: bool = False):
        self.cfg = cfg
        # reference multinomial batch mixing (semi_sampler.py:113-135).
        # Opt-in: each sup/unsup composition is a distinct batch shape,
        # so XLA compiles one program per composition (<= batch-1 of
        # them, cached after the first occurrence of each).
        self.by_prob = by_prob
        if by_prob and cfg.cls_avg_groups:
            # _grouped_cls_weights falls back to the global sync-semantics
            # factor whenever the drawn composition isn't divisible by the
            # group size — under by_prob that flips semantics step to step
            get_logger().warning(
                "cls_avg_groups with by_prob=True: per-GPU cls "
                "normalization silently degrades to the global factor on "
                "steps whose drawn sup/unsup composition is not divisible "
                "by the group size; prefer exact-ratio mixing "
                "(by_prob=False) when cls_avg_groups is set")
        self.donate = donate
        self.work_dir = work_dir
        # throttled pseudo-label render interval, 0 = off (reference
        # log_image_with_boxes, detr_ssod/utils/logger.py:91-161)
        self.image_log_interval = image_log_interval
        self.multi_bucket = multi_bucket
        self.epoch_length = epoch_length
        self.scales = scales
        self.sup_dataset = sup_dataset
        self.unsup_dataset = unsup_dataset
        self.val_dataset = val_dataset
        self.total_steps = total_steps
        self.eval_interval = eval_interval
        self.bucket = bucket
        self.seed = seed
        self.samples_per_batch = samples_per_batch
        self.sample_ratio = sample_ratio

        self.detector = DINODetector(cfg.dino)
        self.projector = Projector(cfg.dino.d_model)
        # a 1-device mesh adds sharding machinery for no benefit (and the
        # axon TPU tunnel mishandles donated/sharded outputs) — plain jit
        self.mesh = _build_mesh(use_mesh, tp)

        rng = jax.random.PRNGKey(seed)
        h, w = bucket
        sample = jnp.zeros((1, h, w, 3), jnp.float32)
        hw = jnp.asarray([[h, w]], jnp.int32)
        state = init_ssod_state(self.detector, self.projector,
                                optax.identity(), cfg, rng, sample, hw)
        self.tx = optim.make_optimizer(state.params, base_lr=lr,
                                       lr_boundaries=lr_boundaries)
        self.state = state.replace(opt_state=self.tx.init(state.params))
        self.logger = MetricsLogger(work_dir, use_wandb=use_wandb)
        self.ckpt = CheckpointManager(work_dir + "/ckpt",
                                      interval=ckpt_interval)
        # warm-start only on a FRESH run: if the work dir already has a
        # checkpoint, resume() will overwrite these weights anyway — skip
        # the (potentially minutes-long) torch-load + conversion
        if self.ckpt.latest_step() is None:
            if backbone_init:
                from .checkpoint import apply_backbone_init
                self.state = apply_backbone_init(self.state, backbone_init,
                                                 ssod=True)
            if load_from:
                from .checkpoint import apply_warm_start, load_warm_start
                self.state = apply_warm_start(
                    self.state,
                    load_warm_start(load_from, cfg.dino.n_heads),
                    ssod=True)
        self.state_sharding = _state_sharding(self.mesh, self.state,
                                              fsdp, tp)
        if self.mesh is not None:
            self.state = jax.device_put(self.state, self.state_sharding)
        self._steps = {}

    def _get_step(self, warm_up: bool):
        if warm_up not in self._steps:
            self._steps[warm_up] = make_ssod_train_step(
                self.detector, self.projector, self.tx, self.cfg,
                warm_up=warm_up, mesh=self.mesh, donate=self.donate,
                state_sharding=self.state_sharding)
        return self._steps[warm_up]

    def batches(self, start_step: int = 0):
        """Epoch-seeded batch stream (reference semi_sampler reshuffles
        every `epoch_length` steps via set_epoch, semi_sampler.py:82-84).

        Resume is O(epoch): replay skips at most epoch_length - 1 sampler
        draws, and the augment/bucket RNGs are seeded PER GLOBAL STEP, so
        a resumed run reproduces the exact batches of an uninterrupted
        one (multi-host shards agree on step bucket by construction)."""
        import itertools
        r_sup, r_unsup = self.sample_ratio
        scale = self.samples_per_batch / (r_sup + r_unsup)
        n_sup = max(int(round(r_sup * scale)), 1)
        n_unsup = self.samples_per_batch - n_sup
        sampler = SemiBalanceSampler(
            len(self.sup_dataset), len(self.unsup_dataset),
            self.sup_dataset.flags, self.unsup_dataset.flags,
            self.samples_per_batch, (n_sup, n_unsup),
            epoch_length=self.epoch_length, seed=self.seed,
            by_prob=self.by_prob,
            # per-host disjoint slices of the same global step
            # (reference rank sharding, semi_sampler.py:185-187)
            num_shards=jax.process_count(), shard_id=jax.process_index())
        ep0, off = divmod(start_step, self.epoch_length)
        for ep in itertools.count(ep0):
            it = sampler.epoch(ep)
            for i, (sup_idx, unsup_idx, flag) in enumerate(it):
                if ep == ep0 and i < off:
                    continue
                step = ep * self.epoch_length + i
                scales = self.scales
                if self.multi_bucket:
                    # per-image scales drawn from the bucket's class
                    scales, bucket = pick_step_bucket(
                        np.random.default_rng((self.seed, 99, step)),
                        self.scales or COCO_SCALES, self.bucket, flag)
                else:
                    bucket = _bucket_for_flag(self.bucket, flag)
                rng = np.random.default_rng((self.seed, 7, step))
                # by_prob: batch shapes follow the drawn composition
                # (one compiled program per composition, as in the
                # reference's variable per-batch mixing)
                b_sup = len(sup_idx) if self.by_prob else n_sup
                b_unsup = len(unsup_idx) if self.by_prob else n_unsup
                sup = make_sup_batch(rng, self.sup_dataset,
                                     _pad_indices(sup_idx, b_sup), bucket,
                                     self.cfg.dino.max_gt, scales=scales)
                unsup = make_unsup_batch(rng, self.unsup_dataset,
                                         _pad_indices(unsup_idx, b_unsup),
                                         bucket, self.cfg.dino.max_gt,
                                         scales=scales)
                sup.pop("image_ids", None)
                unsup.pop("image_ids", None)
                yield {"sup": sup, "unsup": unsup}

    def resume(self, path: Optional[str] = None):
        """Restore the latest checkpoint from `path` (--resume-from) or
        the work dir."""
        mgr = self.ckpt if path is None else CheckpointManager(path)
        if mgr.latest_step() is not None:
            self.state = mgr.restore(self.state)
            self.logger.logger.info(
                f"resumed from step {int(self.state.step)}")
        elif path is not None:
            raise FileNotFoundError(f"--resume-from: no checkpoint in {path}")

    def train(self, max_steps: Optional[int] = None):
        self.logger.logger.info(
            weight_summary(self.state.params).split("TOTAL")[-1])
        rng = jax.random.PRNGKey(self.seed + 13)
        total = min(self.total_steps, max_steps or self.total_steps)
        put = _batch_put(self.mesh, vis=True)
        for batch in prefetch(self.batches(start_step=int(self.state.step)),
                              transform=put):
            step = int(self.state.step)
            if step >= total:
                break
            warm_up = step < self.cfg.warm_up_step
            if put is not None:
                vis_img = batch.pop("_vis_img")
            else:
                vis_img = np.asarray(batch["unsup"]["student_images"][0])
                if self.mesh is not None:
                    batch = shard_batch(batch, self.mesh)
            step_fn = self._get_step(warm_up)
            self.state, metrics = step_fn(self.state, batch, rng)
            vis = metrics.pop("pseudo_vis", None)
            if (vis is not None and self.image_log_interval
                    and step % self.image_log_interval == 0
                    and jax.process_index() == 0):
                vis = jax.device_get(vis)
                log_image_with_boxes(
                    self.work_dir, "pseudo_vis", step, vis_img,
                    vis["boxes"], vis["labels"], vis["scores"],
                    vis["keep"],
                    class_names=getattr(self.unsup_dataset, "classes",
                                        None))
            self.logger.log_step(step, metrics)
            if step % 1000 == 0:
                mem = device_memory_summary()
                if mem:   # post-step peak HBM: bounds per-chip batch size
                    self.logger.logger.info(f"hbm: {mem}")
            self.ckpt.maybe_save(self.state)
            if (self.val_dataset is not None and step > 0
                    and step % self.eval_interval == 0):
                self.evaluate(step, warm_up)
        self.ckpt.maybe_save(self.state, force=True)
        self.ckpt.close()
        return self.state

    def evaluate(self, step: int, warm_up: bool):
        test_scale = max(self.scales) if self.scales else None
        results = evaluate_teacher_and_student(
            self.detector, self.state, self.val_dataset,
            use_nms=warm_up, bucket=self.bucket, test_scale=test_scale,
            num_classes=self.cfg.dino.num_classes, mesh=self.mesh)
        for tag, res in results.items():
            self.logger.log_eval(step, res, tag)
        return results


class SupervisedTrainer:
    """Supervised DINO trainer (12-epoch recipe or SSOD-head variant)."""

    def __init__(self, cfg: DinoConfig, dataset, val_dataset=None,
                 work_dir: str = "work_dir_sup", total_steps: int = 90000,
                 batch_size: int = 16, lr: float = 1e-4,
                 lr_boundaries=(82500,), warm_up_step: int = 0,
                 eval_interval: int = 4000, ckpt_interval: int = 4000,
                 bucket=(800, 1344), scales=None, seed: int = 0,
                 use_mesh: bool = True, with_teacher: bool = False,
                 backbone_init: Optional[str] = None,
                 load_from: Optional[str] = None,
                 multi_bucket: bool = False,
                 fsdp: bool = False, tp: int = 1,
                 donate: bool = False,
                 use_wandb: bool = False,
                 cls_avg_group=None):
        self.cfg = cfg
        self.donate = donate
        self.cls_avg_group = cls_avg_group
        self.multi_bucket = multi_bucket
        self.scales = scales
        self.dataset = dataset
        self.val_dataset = val_dataset
        self.total_steps = total_steps
        self.batch_size = batch_size
        self.warm_up_step = warm_up_step
        self.eval_interval = eval_interval
        self.bucket = bucket
        self.seed = seed

        self.detector = DINODetector(cfg)
        self.mesh = _build_mesh(use_mesh, tp)

        rng = jax.random.PRNGKey(seed)
        h, w = bucket
        variables = self.detector.init(
            {"params": rng}, jnp.zeros((1, h, w, 3)),
            jnp.asarray([[h, w]], jnp.int32))
        self.tx = optim.make_optimizer(variables["params"], base_lr=lr,
                                       lr_boundaries=lr_boundaries)
        self.state = TrainState.create(variables, self.tx,
                                       with_teacher=with_teacher)
        self.logger = MetricsLogger(work_dir, use_wandb=use_wandb)
        self.ckpt = CheckpointManager(work_dir + "/ckpt",
                                      interval=ckpt_interval)
        # warm-start only on a fresh run (see SsodTrainer)
        if self.ckpt.latest_step() is None:
            if backbone_init:
                from .checkpoint import apply_backbone_init
                self.state = apply_backbone_init(self.state, backbone_init,
                                                 ssod=False)
            if load_from:
                from .checkpoint import apply_warm_start, load_warm_start
                self.state = apply_warm_start(
                    self.state, load_warm_start(load_from, cfg.n_heads),
                    ssod=False)
        self.state_sharding = _state_sharding(self.mesh, self.state,
                                              fsdp, tp)
        if self.mesh is not None:
            self.state = jax.device_put(self.state, self.state_sharding)
        self._steps = {}

    def _get_step(self, warm_up: bool):
        if warm_up not in self._steps:
            self._steps[warm_up] = make_supervised_train_step(
                self.detector, self.tx, warm_up=warm_up, mesh=self.mesh,
                donate=self.donate, state_sharding=self.state_sharding,
                cls_avg_group=self.cls_avg_group)
        return self._steps[warm_up]

    def resume(self, path: Optional[str] = None):
        """Restore the latest checkpoint from `path` (--resume-from) or
        the work dir."""
        mgr = self.ckpt if path is None else CheckpointManager(path)
        if mgr.latest_step() is not None:
            self.state = mgr.restore(self.state)
            self.logger.logger.info(
                f"resumed from step {int(self.state.step)}")
        elif path is not None:
            raise FileNotFoundError(f"--resume-from: no checkpoint in {path}")

    def batches(self, start_step: int = 0):
        """Aspect-ratio-homogeneous batches (mmdet GroupSampler
        semantics): each batch draws from one orientation group and pads
        to that orientation's bucket. `batch_size` is PER-HOST; on
        multi-host runs every process draws the same global step and
        slices its disjoint chunk (same scheme as SemiBalanceSampler).

        `start_step` replays the cheap per-step bookkeeping (flag draw,
        cursors, bucket draw) WITHOUT loading images, so a resumed run
        continues the exact batch schedule of an uninterrupted one; the
        augment RNG is seeded per global step for the same reason."""
        order_rng = np.random.default_rng(self.seed)
        bucket_rng = np.random.default_rng(self.seed + 99)
        n_shards, shard = jax.process_count(), jax.process_index()
        flags = np.asarray(self.dataset.flags)
        groups = {f: np.nonzero(flags == f)[0] for f in (0, 1)
                  if (flags == f).any()}
        perms = {f: order_rng.permutation(ids)
                 for f, ids in groups.items()}
        cursors = {f: 0 for f in groups}
        fl = list(groups)
        weights = np.asarray([len(groups[f]) for f in fl], np.float64)
        weights = weights / weights.sum()
        step = 0
        while True:
            f = int(order_rng.choice(fl, p=weights))
            idx = []
            for _ in range(self.batch_size * n_shards):
                if cursors[f] >= len(groups[f]):
                    perms[f] = order_rng.permutation(groups[f])
                    cursors[f] = 0
                idx.append(int(perms[f][cursors[f]]))
                cursors[f] += 1
            idx = idx[shard * self.batch_size:(shard + 1) * self.batch_size]
            scales = self.scales
            if self.multi_bucket:
                # per-image scales drawn from the bucket's class
                scales, bucket = pick_step_bucket(
                    bucket_rng, self.scales or COCO_SCALES, self.bucket, f)
            else:
                bucket = _bucket_for_flag(self.bucket, f)
            if step >= start_step:
                batch = make_sup_batch(
                    np.random.default_rng((self.seed, 7, step)),
                    self.dataset, idx, bucket, self.cfg.max_gt,
                    scales=scales)
                batch.pop("image_ids", None)
                yield batch
            step += 1

    def train(self, max_steps: Optional[int] = None):
        rng = jax.random.PRNGKey(self.seed + 13)
        total = min(self.total_steps, max_steps or self.total_steps)
        put = _batch_put(self.mesh)
        gen = prefetch(self.batches(start_step=int(self.state.step)),
                       transform=put)
        while int(self.state.step) < total:
            step = int(self.state.step)
            batch = next(gen)
            if put is None and self.mesh is not None:
                batch = shard_batch(batch, self.mesh)
            warm_up = step < self.warm_up_step
            self.state, metrics = self._get_step(warm_up)(
                self.state, batch, rng)
            self.logger.log_step(step, metrics)
            self.ckpt.maybe_save(self.state)
            if (self.val_dataset is not None and step > 0
                    and step % self.eval_interval == 0):
                test_scale = max(self.scales) if self.scales else None
                results = evaluate_teacher_and_student(
                    self.detector, self.state, self.val_dataset,
                    use_nms=warm_up, bucket=self.bucket,
                    test_scale=test_scale,
                    num_classes=self.cfg.num_classes, mesh=self.mesh)
                for tag, res in results.items():
                    self.logger.log_eval(step, res, tag)
        self.ckpt.maybe_save(self.state, force=True)
        self.ckpt.close()
        return self.state
