"""Full-model torch->flax weight converter: structure + numerical parity.

The reference's checkpoints are not in the sandbox, so the tests build the
reference module SKELETON in torch.nn (same attribute names as
`detr_od/models/dense_heads/dino_detr_head.py:215-281` and
`detr_od/models/utils/transformer.py:1046-1224` produce in a state_dict),
then check:

1. `convert_dino_detector` consumes a real torch state_dict() and yields a
   variable tree that exactly matches a freshly-initialized
   `DINODetector` (structure and shapes) — key coverage proof.
2. `export_dino_detector` is the exact inverse (round-trip equality, and
   its key set matches torch's own state_dict key set).
3. Numerical parity of the conversion rules against torch semantics:
   nn.MultiheadAttention vs flax MultiHeadDotProductAttention (the only
   non-trivial weight transposition), and the SSOD Projector including the
   NCHW-vs-HWC flatten permutation for fc1.
4. The teacher/student duplication rule for plain checkpoints
   (`detr_ssod/models/dino_detr_ssod.py:953-978`).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import jax.tree_util as jtu  # noqa: E402

from semi_detr_tpu.models.dino_head import DINODetector, DinoConfig  # noqa: E402
from semi_detr_tpu.models.ssod import Projector  # noqa: E402
from semi_detr_tpu.utils.torch_weights import (  # noqa: E402
    convert_dino_detector, convert_projector, convert_ssod_checkpoint,
    export_dino_detector, split_teacher_student)

from test_torch_weights import TorchResNet50  # noqa: E402

D, HEADS, FFN, NENC, NDEC, NCLS, NQ = 32, 4, 64, 2, 2, 5, 20

TINY = DinoConfig(num_classes=NCLS, num_queries=NQ, d_model=D, n_heads=HEADS,
                  num_encoder_layers=NENC, num_decoder_layers=NDEC, d_ffn=FFN,
                  dn_single_pad=4, dn_groups=2, max_gt=8)


class TorchMLP(nn.Module):
    """Reference MLP layout (transformer.py:453-465)."""

    def __init__(self, din, dh, dout, n):
        super().__init__()
        dims = [din] + [dh] * (n - 1)
        self.layers = nn.ModuleList(
            nn.Linear(a, b) for a, b in zip(dims, dims[1:] + [dout]))
        self.layers[-1] = nn.Linear(dims[-1], dout)


class TorchMSDA(nn.Module):
    """Reference MSDeformAttn projection layout (ms_deform_attn.py:55-58)."""

    def __init__(self, d, heads, levels=4, points=4):
        super().__init__()
        self.sampling_offsets = nn.Linear(d, heads * levels * points * 2)
        self.attention_weights = nn.Linear(d, heads * levels * points)
        self.value_proj = nn.Linear(d, d)
        self.output_proj = nn.Linear(d, d)


class TorchEncLayer(nn.Module):
    def __init__(self):
        super().__init__()
        self.self_attn = TorchMSDA(D, HEADS)
        self.norm1 = nn.LayerNorm(D)
        self.linear1 = nn.Linear(D, FFN)
        self.linear2 = nn.Linear(FFN, D)
        self.norm2 = nn.LayerNorm(D)


class TorchDecLayer(nn.Module):
    def __init__(self):
        super().__init__()
        self.cross_attn = TorchMSDA(D, HEADS)
        self.norm1 = nn.LayerNorm(D)
        self.self_attn = nn.MultiheadAttention(D, HEADS)
        self.norm2 = nn.LayerNorm(D)
        self.linear1 = nn.Linear(D, FFN)
        self.linear2 = nn.Linear(FFN, D)
        self.norm3 = nn.LayerNorm(D)


class TorchTransformer(nn.Module):
    def __init__(self):
        super().__init__()
        self.level_embed = nn.Parameter(torch.randn(4, D))
        self.encoder = nn.Module()
        self.encoder.layers = nn.ModuleList(
            TorchEncLayer() for _ in range(NENC))
        self.decoder = nn.Module()
        self.decoder.layers = nn.ModuleList(
            TorchDecLayer() for _ in range(NDEC))
        self.decoder.norm = nn.LayerNorm(D)
        self.decoder.ref_point_head = TorchMLP(2 * D, D, D, 2)
        self.tgt_embed = nn.Embedding(NQ, D)
        self.enc_output = nn.Linear(D, D)
        self.enc_output_norm = nn.LayerNorm(D)


class TorchHead(nn.Module):
    """Reference DINODETRHead param layout (dino_detr_head.py:215-281):
    shared cls Linear / box MLP repeated per decoder layer, separate
    encoder-stage copies, input_proj convs+GN, label_enc embedding."""

    def __init__(self):
        super().__init__()
        projs = []
        for cin in (512, 1024, 2048):
            projs.append(nn.Sequential(nn.Conv2d(cin, D, 1),
                                       nn.GroupNorm(4, D)))
        projs.append(nn.Sequential(nn.Conv2d(2048, D, 3, 2, 1),
                                   nn.GroupNorm(4, D)))
        self.input_proj = nn.ModuleList(projs)
        _cls = nn.Linear(D, NCLS)
        _reg = TorchMLP(D, D, 4, 3)
        self.fc_cls = nn.ModuleList([_cls] * NDEC)
        self.fc_reg = nn.ModuleList([_reg] * NDEC)
        self.fc_enc_cls = nn.Linear(D, NCLS)
        self.fc_enc_reg = TorchMLP(D, D, 4, 3)
        self.label_enc = nn.Embedding(82, D)
        self.transformer = TorchTransformer()


class TorchDetector(nn.Module):
    def __init__(self):
        super().__init__()
        self.backbone = TorchResNet50()
        self.bbox_head = TorchHead()


def _torch_sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()
            if "num_batches" not in k}


def _flax_template():
    m = DINODetector(TINY)
    gt = {"boxes": jnp.full((1, 8, 4), 0.5),
          "labels": jnp.zeros((1, 8), jnp.int32),
          "valid": jnp.zeros((1, 8), bool)}
    return jax.eval_shape(
        lambda r: m.init(r, jnp.zeros((1, 64, 64, 3)),
                         jnp.array([[64, 64]]), gt=gt,
                         dn_rng=jax.random.PRNGKey(1)),
        jax.random.PRNGKey(0))


def test_full_detector_structure_and_roundtrip():
    torch.manual_seed(0)
    tmodel = TorchDetector()
    sd = _torch_sd(tmodel)
    variables = convert_dino_detector(sd, n_heads=HEADS)

    template = _flax_template()
    t_paths = {jtu.keystr(p): v.shape
               for p, v in jtu.tree_flatten_with_path(template)[0]}
    g_paths = {jtu.keystr(p): np.asarray(v).shape
               for p, v in jtu.tree_flatten_with_path(variables)[0]}
    assert t_paths == g_paths

    # inverse: exported key set == torch's own state_dict key set,
    # and converting the export again reproduces the tree exactly
    sd2 = export_dino_detector(variables, num_decoder_layers=NDEC)
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(sd2[k], sd[k], err_msg=k)


def test_mha_conversion_parity():
    """torch nn.MultiheadAttention == flax MultiHeadDotProductAttention
    after _mha weight mapping, incl. a blocked-attention mask."""
    import flax.linen as fnn
    from semi_detr_tpu.utils.torch_weights import _mha

    torch.manual_seed(1)
    tm = nn.MultiheadAttention(D, HEADS, batch_first=True)
    sd = {"sa." + k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = _mha(sd, "sa", HEADS)

    rng = np.random.RandomState(0)
    q = rng.randn(2, 9, D).astype(np.float32)
    v = rng.randn(2, 9, D).astype(np.float32)
    blocked = rng.rand(9, 9) < 0.3          # True = may not attend
    np.fill_diagonal(blocked, False)

    with torch.no_grad():
        exp, _ = tm(torch.from_numpy(q), torch.from_numpy(q),
                    torch.from_numpy(v),
                    attn_mask=torch.from_numpy(blocked))

    fm = fnn.MultiHeadDotProductAttention(num_heads=HEADS, qkv_features=D)
    got = fm.apply({"params": params}, inputs_q=jnp.asarray(q),
                   inputs_k=jnp.asarray(q), inputs_v=jnp.asarray(v),
                   mask=jnp.asarray(~blocked)[None, None])
    np.testing.assert_allclose(np.asarray(got), exp.numpy(),
                               rtol=1e-4, atol=1e-5)


class TorchProjector(nn.Module):
    """Reference Projector architecture (dino_detr_ssod.py:33-72) at
    reduced width: [conv3x3-BN-ReLU]x2, NCHW flatten, fc-BN-ReLU, fc-ReLU."""

    def __init__(self, c=8):
        super().__init__()
        self.conv1 = nn.Conv2d(c, c, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(c)
        self.conv2 = nn.Conv2d(c, c, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(c)
        self.fc1 = nn.Linear(c * 49, 1024)
        self.bn = nn.BatchNorm1d(1024)
        self.fc2 = nn.Linear(1024, c)

    def forward(self, x):
        h = torch.relu(self.bn1(self.conv1(x)))
        h = torch.relu(self.bn2(self.conv2(h)))
        h = h.flatten(1)
        h = torch.relu(self.bn(self.fc1(h)))
        return torch.relu(self.fc2(h))


def test_projector_conversion_parity():
    """Training-mode BN == masked-BN with a full mask; fc1 flatten
    permutation (torch c*49+h*7+w vs flax h*7*c+w*c+c) is exact."""
    torch.manual_seed(2)
    tm = TorchProjector(c=8).train()
    sd = {"projector." + k: v.detach().numpy()
          for k, v in tm.state_dict().items() if "num_batches" not in k}
    params = convert_projector(sd)

    x = np.random.RandomState(1).randn(6, 7, 7, 8).astype(np.float32)
    with torch.no_grad():
        exp = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = Projector(features=8).apply(
        {"params": params}, jnp.asarray(x), jnp.ones((6,), bool))
    np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-3, atol=1e-4)


def test_warm_start_from_pth_and_backbone_init(tmp_path):
    """`--load-from foo.pth` / `backbone_init` plumbing: torch .pth ->
    TrainState (student + teacher EMA copy + frozen BN stats)."""
    import optax

    from semi_detr_tpu.train.checkpoint import (apply_backbone_init,
                                                apply_warm_start,
                                                load_warm_start)
    from semi_detr_tpu.train.state import TrainState

    torch.manual_seed(4)
    tmodel = TorchDetector()
    pth = str(tmp_path / "det.pth")
    torch.save(tmodel.state_dict(), pth)

    template = _flax_template()
    det_zero = jax.tree.map(lambda x: np.zeros(x.shape, x.dtype),
                            template["params"])
    stats_zero = jax.tree.map(lambda x: np.zeros(x.shape, x.dtype),
                              template["batch_stats"])
    proj = {"w": np.zeros((2,))}
    state = TrainState(step=jnp.zeros((), jnp.int32),
                       params={"detector": det_zero, "projector": proj},
                       batch_stats=stats_zero,
                       teacher_params=det_zero, opt_state=optax.identity()
                       .init(det_zero))

    loaded = load_warm_start(pth, n_heads=HEADS)
    out = apply_warm_start(state, loaded, ssod=True)
    exp = tmodel.bbox_head.label_enc.weight.detach().numpy()
    np.testing.assert_allclose(out.params["detector"]["label_enc"], exp,
                               rtol=1e-6)
    np.testing.assert_allclose(out.teacher_params["label_enc"], exp,
                               rtol=1e-6)
    # projector key absent in a plain detector pth -> left untouched
    np.testing.assert_array_equal(out.params["projector"]["w"],
                                  np.zeros((2,)))

    # backbone-only init from a torchvision-style .pth
    bb_pth = str(tmp_path / "r50.pth")
    torch.save(TorchResNet50().state_dict(), bb_pth)
    out2 = apply_backbone_init(state, bb_pth, ssod=True)
    assert np.abs(out2.params["detector"]["backbone"]["stem_conv"]
                  ["kernel"]).sum() > 0
    assert np.abs(out2.teacher_params["backbone"]["stem_conv"]
                  ["kernel"]).sum() > 0
    np.testing.assert_array_equal(
        out2.params["detector"]["label_enc"], 0)  # only backbone touched
    assert np.abs(out2.batch_stats["backbone"]["stem_bn"]["var"]).sum() > 0


def test_plain_checkpoint_duplicates_into_teacher_and_student():
    torch.manual_seed(3)
    head = TorchHead()
    sd = {"bbox_head." + k: v for k, v in _torch_sd(head).items()}
    sd.update({"backbone." + k: v
               for k, v in _torch_sd(TorchResNet50()).items()})

    t_sd, s_sd, rest = split_teacher_student(sd)
    assert t_sd.keys() == s_sd.keys() == sd.keys() and not rest

    wrapped = {}
    wrapped.update({"teacher." + k: v for k, v in sd.items()})
    wrapped.update({"student." + k: v for k, v in sd.items()})
    tp = TorchProjector(c=8)
    wrapped.update({"projector." + k: v.detach().numpy()
                    for k, v in tp.state_dict().items()
                    if "num_batches" not in k})
    out = convert_ssod_checkpoint(wrapped, n_heads=HEADS)
    assert out["projector"] is not None
    ts = {jtu.keystr(p) for p, _ in
          jtu.tree_flatten_with_path(out["teacher_params"])[0]}
    ss = {jtu.keystr(p) for p, _ in
          jtu.tree_flatten_with_path(out["student"]["params"])[0]}
    assert ts == ss
