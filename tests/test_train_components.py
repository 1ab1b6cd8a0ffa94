"""Train-infrastructure unit tests: EMA, schedules, checkpoint, optimizer
groups, SSOD helpers."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from semi_detr_tpu.train.state import TrainState, ema_momentum, ema_update
from semi_detr_tpu.train.schedules import (constant, linear_warmup,
                                           step_schedule)
from semi_detr_tpu.train import optim


def test_ema_momentum_ramp():
    # reference formula: min(m, 1 - (1+warm)/(step+1+warm))
    assert float(ema_momentum(jnp.int32(0), 0.999)) == 0.0
    assert abs(float(ema_momentum(jnp.int32(1), 0.999)) - 0.5) < 1e-6
    assert float(ema_momentum(jnp.int32(10 ** 6), 0.999)) == pytest.approx(
        0.999)


def test_ema_update_blend():
    t = {"w": jnp.ones((3,))}
    s = {"w": jnp.zeros((3,))}
    out = ema_update(t, s, jnp.int32(10 ** 6), momentum=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9, atol=1e-6)
    # step 0: teacher becomes an exact clone (m=0)
    out0 = ema_update(t, s, jnp.int32(0), momentum=0.9)
    np.testing.assert_allclose(np.asarray(out0["w"]), 0.0, atol=1e-6)


def test_ema_decay_intervals_matches_reference_hook():
    """Closed form vs a direct simulation of the reference MeanTeacher
    hook's cumulative after_train_iter mutation (mean_teacher.py:52-57)."""
    from bisect import bisect_right

    intervals, m0 = [3, 7], 0.9
    for factor in (10.0, 2.0):     # sane direction (1-m shrinks)
        m_sim = m0
        for t in range(12):
            used = min(m_sim, 1 - 1 / (t + 1))     # before_train_iter
            ours = float(ema_momentum(jnp.int32(t), m0,
                                      decay_intervals=tuple(intervals),
                                      decay_factor=factor))
            assert ours == pytest.approx(used, rel=1e-5), (factor, t)
            m_sim = 1 - (1 - m_sim) / factor ** bisect_right(intervals, t)
    # empty intervals == plain ramp
    a = float(ema_momentum(jnp.int32(9), 0.999))
    b = float(ema_momentum(jnp.int32(9), 0.999, decay_intervals=()))
    assert a == b


def test_metrics_logger_wandb_sink(tmp_path, monkeypatch):
    """use_wandb mirrors scalars into the (gated) wandb module."""
    import sys
    import types

    calls = {"log": [], "init": [], "finish": 0}
    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: calls["init"].append(kw)
    fake.log = lambda d, step=None: calls["log"].append((step, d))

    def _fin():
        calls["finish"] += 1
    fake.finish = _fin
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from semi_detr_tpu.utils.logging import MetricsLogger
    lg = MetricsLogger(str(tmp_path), use_tensorboard=False,
                       interval=1, use_wandb=True)
    lg.log_step(1, {"total_loss": jnp.float32(2.0)})
    lg.log_eval(1, {"bbox_mAP": 0.4})
    lg.close()
    assert calls["init"] and calls["finish"] == 1
    assert any("train/total_loss" in d for _, d in calls["log"])
    assert any("eval_teacher/bbox_mAP" in d for _, d in calls["log"])


def test_step_schedule_and_warmup():
    s = step_schedule([1.0, 0.5, 0.1], [100, 200])
    assert float(s(jnp.int32(0))) == 1.0
    assert float(s(jnp.int32(150))) == 0.5
    assert float(s(jnp.int32(250))) == pytest.approx(0.1)
    w = linear_warmup(4.0, 100)
    assert float(w(jnp.int32(0))) == 0.0
    assert float(w(jnp.int32(50))) == pytest.approx(2.0)
    assert float(w(jnp.int32(1000))) == 4.0
    assert float(constant(3.0)(jnp.int32(7))) == 3.0


def test_optimizer_groups_freeze_and_mult():
    params = {
        "backbone": {"stem_conv": {"kernel": jnp.ones((2,))},
                     "layer1_0": {"conv1": {"kernel": jnp.ones((2,))}},
                     "layer3_0": {"conv1": {"kernel": jnp.ones((2,))}}},
        "fc_cls": {"cls": {"kernel": jnp.ones((2,))}},
    }
    tx = optim.make_optimizer(params, base_lr=1.0, weight_decay=0.0,
                              backbone_lr_mult=0.1, clip_norm=1e9)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # frozen: stem + layer1 get exactly zero update
    assert float(jnp.abs(
        updates["backbone"]["stem_conv"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(
        updates["backbone"]["layer1_0"]["conv1"]["kernel"]).max()) == 0.0
    # backbone gets 0.1x the head lr
    head = float(jnp.abs(updates["fc_cls"]["cls"]["kernel"]).max())
    bb = float(jnp.abs(
        updates["backbone"]["layer3_0"]["conv1"]["kernel"]).max())
    assert abs(bb / head - 0.1) < 1e-4


def test_checkpoint_roundtrip(tmp_path):
    from semi_detr_tpu.train.checkpoint import (CheckpointManager,
                                                duplicate_into_teacher)
    tx = optax.sgd(0.1)
    variables = {"params": {"w": jnp.arange(4.0)}}
    state = TrainState.create(variables, tx, with_teacher=True)
    state = state.replace(step=jnp.int32(4000),
                          params={"w": jnp.full((4,), 7.0)})
    mgr = CheckpointManager(str(tmp_path / "ckpt"), interval=4000)
    assert mgr.maybe_save(state)
    mgr.wait()
    assert mgr.latest_step() == 4000
    template = TrainState.create(variables, tx, with_teacher=True)
    restored = mgr.restore(template)
    assert int(restored.step) == 4000
    np.testing.assert_allclose(np.asarray(restored.params["w"]), 7.0)
    mgr.close()
    # warm-start duplication: teacher <- student
    dup = duplicate_into_teacher(restored)
    np.testing.assert_allclose(np.asarray(dup.teacher_params["w"]), 7.0)


def test_migrate_scanned_encoder_layout():
    """Legacy enc_0..enc_{n-1} checkpoints restack into the scanned 'enc'
    subtree; current-layout and unrelated keys pass through untouched."""
    from semi_detr_tpu.train.checkpoint import migrate_scanned_encoder
    legacy = {"transformer": {
        "enc_0": {"norm1": {"scale": np.zeros(4)}},
        "enc_1": {"norm1": {"scale": np.ones(4)}},
        "enc_output": {"kernel": np.ones((4, 4))},   # not a layer key
        "dec_0": {"norm1": {"scale": np.ones(4)}},
    }}
    out = migrate_scanned_encoder(legacy)
    t = out["transformer"]
    assert "enc_0" not in t and "enc_1" not in t
    assert t["enc"]["norm1"]["scale"].shape == (2, 4)
    np.testing.assert_allclose(t["enc"]["norm1"]["scale"][1], 1.0)
    assert "enc_output" in t
    # legacy dec_0.. restacks into the scanned dec/layer subtree
    assert "dec_0" not in t
    assert t["dec"]["layer"]["norm1"]["scale"].shape == (1, 4)
    # idempotent on the current layout (and under a nested detector root)
    again = migrate_scanned_encoder({"detector": out})
    assert again["detector"]["transformer"]["enc"]["norm1"][
        "scale"].shape == (2, 4)
    assert again["detector"]["transformer"]["dec"]["layer"]["norm1"][
        "scale"].shape == (1, 4)
    assert migrate_scanned_encoder(None) is None


def test_dual_filter_and_positions():
    from semi_detr_tpu.models.ssod import SsodConfig, dual_filter
    costs = jnp.asarray([[1.0, 5.0, 2.0, 9.0]])
    scores = jnp.asarray([[0.1, 0.9, 0.2, 0.3]])
    valid = jnp.asarray([[True, True, True, False]])
    keep_sup, keep_cons = dual_filter(costs, scores, valid,
                                      gmm_thr=jnp.float32(2.5),
                                      score_thr=0.4)
    # sup: score >= .4 and valid -> only #1
    assert np.asarray(keep_sup).tolist() == [[False, True, False, False]]
    # cons: sup U (cost <= 2.5) -> #0, #1, #2 (not #3: invalid)
    assert np.asarray(keep_cons).tolist() == [[True, True, True, False]]


def test_combined_attn_mask_structure():
    from semi_detr_tpu.models.ssod import combined_attn_mask
    m = np.asarray(combined_attn_mask(cons_pad=6, cons_groups=2,
                                      dn_single_pad=2, dn_groups=1,
                                      num_queries=4))
    # total = 6 + 4 + 4
    assert m.shape == (14, 14)
    # matching queries can't see any front block
    assert m[10:, :10].all() and not m[10:, 10:].any()
    # consistency group 0 (rows 0-2) blocked from group 1 + dn
    assert m[0, 3] and m[0, 6] and not m[0, 1]
    # cons queries CAN see matching
    assert not m[0, 10:].any()
    # dn group sees itself + matching only
    assert m[6, 0] and not m[6, 7] and not m[6, 10:].any()


def test_ssod_batch_stream_epoch_resume():
    """SsodTrainer.batches: epoch-seeded reshuffle (reference
    semi_sampler.py:82-84) + O(epoch) resume reproducing the exact
    uninterrupted stream (per-step-seeded aug/bucket RNGs)."""
    from semi_detr_tpu.models.dino_head import DinoConfig
    from semi_detr_tpu.models.ssod import SsodConfig
    from semi_detr_tpu.train.loop import SsodTrainer

    class FakeDs:
        def __init__(self, n, seed):
            from types import SimpleNamespace
            rs = np.random.RandomState(seed)
            self.flags = np.ones(n, np.int64)
            self.imgs = [(rs.rand(32, 40, 3) * 255).astype(np.uint8)
                         for _ in range(n)]
            self.recs = [
                SimpleNamespace(boxes=np.asarray([[4.0, 4.0, 20.0, 16.0]],
                                                 np.float32),
                                labels=np.asarray([0], np.int32), id=i)
                for i in range(n)]

        def __len__(self):
            return len(self.imgs)

        def __getitem__(self, i):
            return self.recs[i]

        def load_image(self, i):
            return self.imgs[i].copy()

    t = SsodTrainer.__new__(SsodTrainer)
    t.cfg = SsodConfig(dino=DinoConfig(num_classes=1, max_gt=4))
    t.sup_dataset = FakeDs(6, 0)
    t.unsup_dataset = FakeDs(9, 1)
    t.samples_per_batch = 3
    t.sample_ratio = (1, 2)
    t.seed = 3
    t.scales = [(24, 32)]
    t.multi_bucket = False
    t.bucket = (32, 40)
    t.epoch_length = 4
    t.by_prob = False

    def grab(gen, n):
        return [next(gen) for _ in range(n)]

    full = grab(t.batches(0), 10)
    resumed = grab(t.batches(6), 4)
    for a, b in zip(full[6:], resumed):
        np.testing.assert_array_equal(a["sup"]["images"],
                                      b["sup"]["images"])
        np.testing.assert_array_equal(a["unsup"]["student_images"],
                                      b["unsup"]["student_images"])
    # epochs reshuffle: two consecutive epochs differ somewhere
    e0 = np.concatenate([b["sup"]["images"].ravel() for b in full[:4]])
    e1 = np.concatenate([b["sup"]["images"].ravel() for b in full[4:8]])
    assert not np.array_equal(e0, e1)


def test_supervised_batch_stream_resume():
    """SupervisedTrainer.batches(start_step) must continue the exact
    schedule of an uninterrupted stream (regression: resume restarted
    the stream from batch 0)."""
    from semi_detr_tpu.models.dino_head import DinoConfig
    from semi_detr_tpu.train.loop import SupervisedTrainer

    class FakeDs:
        def __init__(self, n, seed):
            from types import SimpleNamespace
            rs = np.random.RandomState(seed)
            self.flags = np.ones(n, np.int64)
            self.imgs = [(rs.rand(32, 40, 3) * 255).astype(np.uint8)
                         for _ in range(n)]
            self.recs = [
                SimpleNamespace(boxes=np.asarray([[4.0, 4.0, 20.0, 16.0]],
                                                 np.float32),
                                labels=np.asarray([0], np.int32), id=i)
                for i in range(n)]

        def __len__(self):
            return len(self.imgs)

        def __getitem__(self, i):
            return self.recs[i]

        def load_image(self, i):
            return self.imgs[i].copy()

    t = SupervisedTrainer.__new__(SupervisedTrainer)
    t.cfg = DinoConfig(num_classes=1, max_gt=4)
    t.dataset = FakeDs(7, 0)
    t.batch_size = 2
    t.seed = 5
    t.scales = [(24, 32)]
    t.multi_bucket = False
    t.bucket = (32, 40)

    full = [next(b) for b in [t.batches(0)] for _ in range(9)]
    resumed_gen = t.batches(6)
    resumed = [next(resumed_gen) for _ in range(3)]
    for a, b in zip(full[6:], resumed):
        np.testing.assert_array_equal(a["images"], b["images"])
        np.testing.assert_array_equal(a["gt"]["boxes"], b["gt"]["boxes"])


def test_tp_sharding_spec_rules():
    """Megatron FFN rule (parallel.tp_sharding): linear1 kernel+bias shard
    the d_ffn OUTPUT dim, linear2 kernel shards the d_ffn INPUT dim,
    everything else takes the base spec; non-divisible dims fall back.
    Path-keyed, so the rule hits the same leaves nested under opt_state."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from semi_detr_tpu.parallel import make_mesh, tp_sharding, fsdp_sharding

    mesh = make_mesh((4, 2), devices=jax.devices()[:8])
    params = {
        "transformer": {
            "enc": {  # scanned: leading layer dim
                "linear1": {"kernel": jnp.zeros((6, 64, 128)),
                            "bias": jnp.zeros((6, 128))},
                "linear2": {"kernel": jnp.zeros((6, 128, 64)),
                            "bias": jnp.zeros((6, 64))},
                "norm1": {"scale": jnp.zeros((6, 64))},
            },
            "dec_0": {
                "linear1": {"kernel": jnp.zeros((64, 128)),
                            "bias": jnp.zeros((128,))},
                "linear2": {"kernel": jnp.zeros((128, 63)),  # 63: odd out
                            "bias": jnp.zeros((63,))},
            },
        },
        "fc_cls": {"kernel": jnp.zeros((64, 7))},
    }
    tree = {"params": params, "mu": jax.tree.map(lambda x: x, params)}
    sh = tp_sharding(mesh, tree)
    for grp in ("params", "mu"):
        enc = sh[grp]["transformer"]["enc"]
        assert enc["linear1"]["kernel"].spec == P(None, None, "model")
        assert enc["linear1"]["bias"].spec == P(None, "model")
        assert enc["linear2"]["kernel"].spec == P(None, "model", None)
        assert enc["linear2"]["bias"].spec == P()
        assert enc["norm1"]["scale"].spec == P()
        dec = sh[grp]["transformer"]["dec_0"]
        assert dec["linear1"]["kernel"].spec == P(None, "model")
        assert dec["linear2"]["kernel"].spec == P("model", None)
        assert sh[grp]["fc_cls"]["kernel"].spec == P()

    # composes with an FSDP base: TP wins on FFN leaves, base elsewhere
    base = fsdp_sharding(mesh, tree, min_size=1)
    sh2 = tp_sharding(mesh, tree, base=base)
    assert sh2["params"]["transformer"]["enc"]["linear1"]["kernel"].spec \
        == P(None, None, "model")
    assert sh2["params"]["fc_cls"]["kernel"].spec == \
        base["params"]["fc_cls"]["kernel"].spec


@pytest.mark.slow
def test_fused_encode_matches_separate():
    """The fused sup+unsup encoder pass (train/ssod.py loss_fn) must
    equal per-branch encodes up to f32 conv reduction-order drift:
    every encode op is per-image, so batching is mathematically exact."""
    from semi_detr_tpu.models.dino_head import DinoConfig, DINODetector

    cfg = DinoConfig(num_classes=3, num_queries=16, d_model=64, n_heads=2,
                     num_encoder_layers=1, num_decoder_layers=2, d_ffn=64,
                     dn_single_pad=4, dn_groups=2)
    det = DINODetector(cfg)
    rng = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(rng, (3, 64, 96, 3), jnp.float32)
    hw = jnp.asarray([[64, 96], [60, 80], [64, 90]], jnp.int32)
    vars_ = det.init(rng, imgs[:1], hw[:1])

    enc_all = det.apply(vars_, imgs, hw, method=DINODetector.encode_images)
    enc_a = det.apply(vars_, imgs[:1], hw[:1],
                      method=DINODetector.encode_images)
    enc_b = det.apply(vars_, imgs[1:], hw[1:],
                      method=DINODetector.encode_images)
    for k in ("memory", "tgt", "refpoint_unsig", "enc_out_class",
              "enc_out_coord"):
        a = np.asarray(enc_all[k])
        s = np.concatenate([np.asarray(enc_a[k]), np.asarray(enc_b[k])])
        np.testing.assert_allclose(a, s, atol=1e-5, rtol=1e-4,
                                   err_msg=k)

    # __call__(enc=...) consumes a precomputed encode bit-identically
    # to computing the same encode internally; _slice_enc carves a
    # batch slice with the static metadata intact
    from semi_detr_tpu.train.ssod import _slice_enc
    sl = _slice_enc(enc_all, 0, 1)
    assert sl["spatial_shapes"] == enc_all["spatial_shapes"]
    assert sl["memory"].shape[0] == 1
    out_pre = det.apply(vars_, imgs[:1], hw[:1], enc=enc_a)
    out_int = det.apply(vars_, imgs[:1], hw[:1])
    for k in ("cls", "coord"):
        np.testing.assert_array_equal(np.asarray(out_pre[k]),
                                      np.asarray(out_int[k]))
