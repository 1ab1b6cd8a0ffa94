"""Multi-device numerical equivalence + end-to-end train smoke.

1. Mesh equivalence: the SAME global batch through `make_ssod_train_step`
   on 1 device vs an 8-device `data` mesh must produce equal losses and
   gradients — this converts the design claim "batch sums ARE the
   collectives" (parallel/mesh.py) into a regression guarantee. The
   reference has no analog test; its DDP correctness is implicit in
   torch (SURVEY.md §4).
2. Supervised overfit smoke: a tiny synthetic COCO dataset through the
   real `SupervisedTrainer` CLI path (sampler -> pipeline -> train step ->
   checkpoint -> eval), asserting the loss drops, eval produces finite
   mAP, and checkpoint/resume restores the step.
"""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_cfgs():
    """EXACTLY the dryrun_multichip tiny config (shares its compile cache)."""
    from semi_detr_tpu.models.dino_head import DinoConfig
    from semi_detr_tpu.models.ssod import SsodConfig
    tiny = DinoConfig(num_classes=7, num_queries=24, d_model=64, n_heads=2,
                      num_encoder_layers=1, num_decoder_layers=2, d_ffn=64,
                      dn_single_pad=4, dn_groups=2, max_gt=8)
    return tiny, SsodConfig(dino=tiny, max_pseudo=4, cons_groups=2,
                            nms_max_out=16, nms_pre_topk=32)


def _tiny_batch(b, g, rs):
    imgs = rs.standard_normal((b, 64, 64, 3)).astype(np.float32) * 0.5
    hw = np.tile([[64, 64]], (b, 1)).astype(np.int32)
    eye = np.tile(np.eye(3, dtype=np.float32)[None], (b, 1, 1))
    cxy = rs.uniform(0.3, 0.7, (b, g, 2)).astype(np.float32)
    wh = rs.uniform(0.1, 0.3, (b, g, 2)).astype(np.float32)
    return {
        "sup": {
            "images": imgs, "img_hw": hw,
            "gt": {"boxes": np.concatenate([cxy, wh], -1),
                   "labels": rs.randint(0, 7, (b, g)).astype(np.int32),
                   "valid": np.tile(np.arange(g)[None] < 3, (b, 1))},
        },
        "unsup": {
            "student_images": imgs[::-1].copy(), "student_hw": hw,
            "student_tmat": eye,
            "teacher_images": imgs[::-1].copy(), "teacher_hw": hw,
            "teacher_tmat": eye,
        },
    }


def _mesh_equivalence_body():
    import optax

    from semi_detr_tpu.models.dino_head import DINODetector
    from semi_detr_tpu.models.ssod import Projector
    from semi_detr_tpu.parallel import make_mesh, shard_batch
    from semi_detr_tpu.train import optim
    from semi_detr_tpu.train.ssod import (init_ssod_state,
                                          make_ssod_train_step)

    tiny, cfg = _tiny_cfgs()
    detector, projector = DINODetector(tiny), Projector(tiny.d_model)
    rng = jax.random.PRNGKey(0)
    batch = _tiny_batch(8, tiny.max_gt, np.random.RandomState(0))

    state0 = init_ssod_state(detector, projector, optax.identity(), cfg,
                             rng, jnp.zeros((1, 64, 64, 3)),
                             jnp.asarray([[64, 64]], jnp.int32))
    tx = optim.make_optimizer(state0.params)
    state0 = state0.replace(opt_state=tx.init(state0.params))

    step1 = make_ssod_train_step(detector, projector, tx, cfg,
                                 warm_up=True, mesh=None)
    s1, m1 = step1(state0, batch, rng)

    mesh = make_mesh(devices=jax.devices()[:8])
    from jax.sharding import NamedSharding, PartitionSpec as P
    state_r = jax.device_put(state0, NamedSharding(mesh, P()))
    step8 = make_ssod_train_step(detector, projector, tx, cfg,
                                 warm_up=True, mesh=mesh)
    s8, m8 = step8(state_r, shard_batch(batch, mesh), rng)

    for key in ("total_loss", "grad_norm", "sup_loss_cls", "sup_loss_bbox",
                "unsup_loss_cls", "gmm_thr", "pseudo_per_img"):
        a, b = float(m1[key]), float(m8[key])
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5, err_msg=key)
    # updated params agree (grads were reduced identically)
    np.testing.assert_allclose(
        np.asarray(s1.params["detector"]["label_enc"]),
        np.asarray(s8.params["detector"]["label_enc"]),
        rtol=1e-4, atol=1e-6)

    # FSDP leg: params/opt/teacher sharded over the same axis
    # (min_size=1 so the tiny config's leaves actually shard) must be
    # numerically equivalent — XLA all-gathers at use, reduce-scatters
    # grads, local AdamW/EMA on shards
    from semi_detr_tpu.parallel import fsdp_sharding
    shards = fsdp_sharding(mesh, state0, min_size=1)
    state_f = jax.device_put(state0, shards)
    stepf = make_ssod_train_step(detector, projector, tx, cfg,
                                 warm_up=True, mesh=mesh,
                                 state_sharding=shards)
    sf, mf = stepf(state_f, shard_batch(batch, mesh), rng)
    for key in ("total_loss", "grad_norm", "unsup_loss_cls", "gmm_thr"):
        np.testing.assert_allclose(float(m1[key]), float(mf[key]),
                                   rtol=2e-3, atol=1e-5, err_msg=key)
    np.testing.assert_allclose(
        np.asarray(s1.params["detector"]["label_enc"]),
        np.asarray(jax.device_get(sf.params["detector"]["label_enc"])),
        rtol=1e-4, atol=1e-6)
    # the big leaves really are sharded, not replicated
    n_sharded = sum(
        int(s.spec != P()) for s in jax.tree.leaves(shards))
    assert n_sharded > 10, n_sharded

    # TP leg: 2-D (data=4, model=2) mesh, Megatron-style FFN sharding
    # (parallel.tp_sharding) — batch sharded over data only, FFN
    # expansion/contraction kernels sharded over model; numerics must
    # match the single-device step
    from semi_detr_tpu.parallel import tp_sharding
    mesh2 = make_mesh((4, 2), devices=jax.devices()[:8])
    tp_shards = tp_sharding(mesh2, state0)
    specs = {"/".join(str(getattr(k, "key", k)) for k in p): s.spec
             for p, s in jax.tree_util.tree_flatten_with_path(tp_shards)[0]}
    ffn_specs = [s for k, s in specs.items()
                 if ("linear1" in k or "linear2" in k) and "detector" in k
                 and k.endswith("kernel")]
    assert ffn_specs and all(
        any(ax == "model" for ax in s) for s in ffn_specs), specs
    state_t = jax.device_put(state0, tp_shards)
    stept = make_ssod_train_step(detector, projector, tx, cfg,
                                 warm_up=True, mesh=mesh2,
                                 state_sharding=tp_shards)
    st, mt = stept(state_t, shard_batch(batch, mesh2), rng)
    for key in ("total_loss", "grad_norm", "unsup_loss_cls", "gmm_thr"):
        np.testing.assert_allclose(float(m1[key]), float(mt[key]),
                                   rtol=2e-3, atol=1e-5, err_msg=key)
    np.testing.assert_allclose(
        np.asarray(s1.params["detector"]["label_enc"]),
        np.asarray(jax.device_get(st.params["detector"]["label_enc"])),
        rtol=1e-4, atol=1e-6)
    # an FFN kernel updated under TP matches the single-device update
    enc1 = s1.params["detector"]["transformer"]["enc"]["linear1"]["kernel"]
    enct = st.params["detector"]["transformer"]["enc"]["linear1"]["kernel"]
    np.testing.assert_allclose(np.asarray(enc1),
                               np.asarray(jax.device_get(enct)),
                               rtol=1e-4, atol=1e-6)

    # FSDP+TP combined (the pod configuration fsdp=True tp=2): TP wins
    # on FFN leaves, FSDP shards the rest over data
    ft_shards = tp_sharding(mesh2, state0,
                            base=fsdp_sharding(mesh2, state0, min_size=1))
    state_ft = jax.device_put(state0, ft_shards)
    stepft = make_ssod_train_step(detector, projector, tx, cfg,
                                  warm_up=True, mesh=mesh2,
                                  state_sharding=ft_shards)
    sft, mft = stepft(state_ft, shard_batch(batch, mesh2), rng)
    for key in ("total_loss", "grad_norm", "unsup_loss_cls", "gmm_thr"):
        np.testing.assert_allclose(float(m1[key]), float(mft[key]),
                                   rtol=2e-3, atol=1e-5, err_msg=key)
    np.testing.assert_allclose(
        np.asarray(s1.params["detector"]["label_enc"]),
        np.asarray(jax.device_get(sft.params["detector"]["label_enc"])),
        rtol=1e-4, atol=1e-6)
    print("MESH_EQUIV_OK")


@pytest.mark.slow
def test_mesh_equivalence_1dev_vs_8dev():
    """Runs the equivalence check in a SUBPROCESS with one retry: XLA's
    CPU 8-virtual-device collective execution intermittently hard-aborts
    the whole process on this 1-vCPU sandbox (upstream race — no
    rendezvous-timeout warning, silent SIGABRT mid-execution). The
    numerics themselves are deterministic; the abort is pure runtime
    flake, so contain it in a child and retry once."""
    import subprocess
    import sys

    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    last = None
    for attempt in range(3):
        out = subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, %r); "
             "import importlib.util as u; "
             "spec = u.spec_from_file_location('meq', %r); "
             "m = u.module_from_spec(spec); spec.loader.exec_module(m); "
             "m._mesh_equivalence_body()" % (
                 os.path.dirname(os.path.dirname(os.path.abspath(
                     __file__))), os.path.abspath(__file__))],
            env=env, capture_output=True, text=True, timeout=3000)
        last = out
        if out.returncode == 0 and "MESH_EQUIV_OK" in out.stdout:
            return
        if out.returncode < 0 or out.returncode == 134:
            continue                      # runtime abort flake: retry
        break                             # real assertion failure
    raise AssertionError(
        f"mesh equivalence failed (rc={last.returncode}):\n"
        f"{last.stdout[-2000:]}\n{last.stderr[-2000:]}")


# --------------------------------------------------------------------------
# end-to-end supervised smoke
# --------------------------------------------------------------------------

def _write_tiny_dataset(root, n=8, hw=(96, 128), seed=0):
    """Synthetic COCO via the framework generator (data.synthetic)."""
    from semi_detr_tpu.data.synthetic import write_synthetic_coco
    return write_synthetic_coco(root, n=n, hw=hw, seed=seed)


@pytest.mark.slow
def test_supervised_overfit_smoke(tmp_path):
    from semi_detr_tpu.data.coco import CocoDataset
    from semi_detr_tpu.models.dino_head import DinoConfig
    from semi_detr_tpu.train.loop import SupervisedTrainer

    ann, img_dir = _write_tiny_dataset(str(tmp_path))
    ds = CocoDataset(ann, img_dir, classes=("person",))
    val = CocoDataset(ann, img_dir, classes=("person",), test_mode=True,
                      filter_empty_gt=False)

    cfg = DinoConfig(num_classes=1, num_queries=24, d_model=64, n_heads=2,
                     num_encoder_layers=1, num_decoder_layers=2, d_ffn=64,
                     dn_single_pad=4, dn_groups=2, max_gt=8)
    work = str(tmp_path / "work")
    steps = 100
    trainer = SupervisedTrainer(
        cfg, ds, val_dataset=None, work_dir=work, total_steps=steps,
        batch_size=2, lr=2e-4, lr_boundaries=(10 ** 6,),
        warm_up_step=10 ** 6,           # O2M+TAL branch (fast overfit)
        ckpt_interval=steps, bucket=(96, 128), scales=[(80, 112)],
        seed=0, use_mesh=False)
    trainer.logger.interval = 1         # per-step loss record
    trainer.train()

    losses = []
    with open(os.path.join(work, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "total_loss" in rec:
                losses.append(rec["total_loss"])
    assert len(losses) == steps
    # NOTE: the TAL warm-up total loss legitimately RISES early (better
    # encoder proposals -> more O2M positives with higher soft targets),
    # so learning success is asserted on mAP, not the raw loss trend.
    assert np.isfinite(losses).all()

    # eval path end-to-end (NMS decode, warm-up branch): the overfit
    # model must find the drawn boxes (measured 0.67 mAP50 at 100 steps)
    from semi_detr_tpu.models.inference import evaluate_teacher_and_student
    results = evaluate_teacher_and_student(
        trainer.detector, trainer.state, val, use_nms=True,
        bucket=(96, 128), test_scale=(80, 112), num_classes=1)
    assert "student" in results
    m = results["student"]
    assert np.isfinite(m["mAP"]) and 0.0 <= m["mAP"] <= 1.0
    assert m["mAP_50"] > 0.3, m      # overfit: finds the drawn boxes

    # checkpoint was written at the final step; resume restores it
    trainer2 = SupervisedTrainer(
        cfg, ds, val_dataset=None, work_dir=work, total_steps=steps,
        batch_size=2, lr=2e-4, lr_boundaries=(10 ** 6,),
        warm_up_step=10 ** 6, ckpt_interval=steps, bucket=(96, 128),
        scales=[(80, 112)], seed=0, use_mesh=False)
    trainer2.resume()
    assert int(trainer2.state.step) == steps
    np.testing.assert_allclose(
        np.asarray(trainer2.state.params["label_enc"]),
        np.asarray(trainer.state.params["label_enc"]), rtol=1e-6)


@pytest.mark.slow
def test_eval_mesh_sharding_equivalence(tmp_path):
    """Data-sharded periodic eval (reference multi_gpu_test analog,
    models/inference.py:run_eval mesh arg) must produce EXACTLY the
    single-device results — the batch rounds up to the data-axis size
    and pads by repeating the last image, whose duplicates overwrite
    the same image_id."""
    import optax

    from semi_detr_tpu.data.coco import CocoDataset
    from semi_detr_tpu.models.dino_head import DINODetector
    from semi_detr_tpu.models.inference import evaluate_detector
    from semi_detr_tpu.models.ssod import Projector
    from semi_detr_tpu.parallel import make_mesh
    from semi_detr_tpu.train.ssod import init_ssod_state

    tiny, cfg = _tiny_cfgs()
    ann, img_dir = _write_tiny_dataset(str(tmp_path), n=10, hw=(64, 64))
    val = CocoDataset(ann, img_dir, classes=("person",), test_mode=True,
                      filter_empty_gt=False)
    det, proj = DINODetector(tiny), Projector(tiny.d_model)
    st = init_ssod_state(det, proj, optax.identity(), cfg,
                         jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                         jnp.asarray([[64, 64]], jnp.int32))
    v = {"params": st.params["detector"], "batch_stats": st.batch_stats}
    kw = dict(batch_size=8, use_nms=False, bucket=(64, 64),
              test_scale=(56, 56), num_classes=7)
    r0 = evaluate_detector(det, v, val, **kw)
    rm = evaluate_detector(det, v, val,
                           mesh=make_mesh(devices=jax.devices()[:8]), **kw)
    for k in ("mAP", "mAP_50", "mAP_75", "AR_100"):
        np.testing.assert_array_equal(r0[k], rm[k]), k
