"""torchvision ResNet-50 weight conversion: numerical parity vs torch.

torchvision is not installed here, so the test defines the torchvision
resnet50 module layout inline with torch.nn (same state_dict keys) and
checks flax forward parity after conversion.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

import jax.numpy as jnp

from semi_detr_tpu.models.resnet import ResNet
from semi_detr_tpu.utils.torch_weights import convert_torchvision_resnet50


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idn = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            idn = self.downsample(x)
        return self.relu(out + idn)


class TorchResNet50(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.inplanes = 64
        self.layer1 = self._make_layer(64, 3, 1)
        self.layer2 = self._make_layer(128, 4, 2)
        self.layer3 = self._make_layer(256, 6, 2)
        self.layer4 = self._make_layer(512, 3, 2)

    def _make_layer(self, planes, blocks, stride):
        ds = nn.Sequential(
            nn.Conv2d(self.inplanes, planes * 4, 1, stride, bias=False),
            nn.BatchNorm2d(planes * 4))
        layers = [Bottleneck(self.inplanes, planes, stride, ds)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(Bottleneck(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        h = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        h = self.layer1(h)
        feats = []
        for layer in (self.layer2, self.layer3, self.layer4):
            h = layer(h)
            feats.append(h)
        return feats


def test_resnet50_forward_parity():
    torch.manual_seed(0)
    tmodel = TorchResNet50()
    # randomize BN stats so frozen-BN conversion is actually exercised
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()
          if "num_batches" not in k}
    # torchvision downsample naming: layerX.0.downsample.{0,1}
    params, stats = convert_torchvision_resnet50(sd)

    model = ResNet(depth=50, out_indices=(1, 2, 3))
    x = np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x))

    with torch.no_grad():
        feats = [f.numpy().transpose(0, 2, 3, 1)
                 for f in tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))]

    for got, exp in zip(out, feats):
        assert got.shape == exp.shape
        np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-3,
                                   atol=1e-3)
