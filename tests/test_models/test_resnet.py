"""ResNet parity: flax ResNet + torch->flax converter vs an independent
torch implementation of the torchvision-compatible architecture
(reference backbone: mmaction/models/backbones/resnet.py:309-654)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from vfs_tpu.checkpoint import (torchvision_to_flax_resnet,
                                vfs_train_ckpt_to_torchvision)
from vfs_tpu.models.backbones import ResNet, ResNetBlockwise


# --- independent torch reference (torchvision resnet basic/bottleneck) -----
class TorchBasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, dilation,
                               dilation, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, dilation, dilation,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet(nn.Module):

    def __init__(self, block, layers, strides=(1, 2, 2, 2),
                 dilations=(1, 1, 1, 1)):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        for i, n in enumerate(layers):
            setattr(self, f'layer{i + 1}',
                    self._make_layer(block, 64 * 2**i, n, strides[i],
                                     dilations[i]))

    def _make_layer(self, block, planes, blocks, stride, dilation):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1, stride,
                          bias=False),
                nn.BatchNorm2d(planes * block.expansion))
        first_dil = dilation if dilation == 1 else dilation // 2
        layers = [block(self.inplanes, planes, stride, first_dil, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes, 1, dilation))
        return nn.Sequential(*layers)

    def forward(self, x, out_indices=(3,)):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        outs = []
        for i in range(4):
            x = getattr(self, f'layer{i + 1}')(x)
            if i in out_indices:
                outs.append(x)
        return outs


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * .1)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + .5)
            m.weight.data.copy_(torch.randn(m.num_features, generator=g) * .1
                                + 1)
            m.bias.data.copy_(torch.randn(m.num_features, generator=g) * .1)


@pytest.mark.parametrize('depth,block,layers,strides,out_indices', [
    (18, TorchBasicBlock, (2, 2, 2, 2), (1, 2, 2, 2), (3,)),
    (18, TorchBasicBlock, (2, 2, 2, 2), (1, 2, 1, 1), (2,)),  # eval strides
    (50, TorchBottleneck, (3, 4, 6, 3), (1, 2, 1, 1), (2,)),
])
def test_resnet_forward_parity(depth, block, layers, strides, out_indices):
    torch.manual_seed(0)
    tmodel = TorchResNet(block, layers, strides=strides)
    _randomize_bn_stats(tmodel)
    tmodel.eval()

    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref_outs = tmodel(x, out_indices=out_indices)

    params, stats = torchvision_to_flax_resnet(
        {k: v.numpy() for k, v in tmodel.state_dict().items()})
    model = ResNet(depth=depth, strides=strides, out_indices=out_indices)
    x_jax = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = model.apply({'params': params, 'batch_stats': stats}, x_jax,
                      train=False)
    outs = out if isinstance(out, tuple) else (out,)
    assert len(outs) == len(ref_outs)
    for o, r in zip(outs, ref_outs):
        o_nchw = np.transpose(np.asarray(o), (0, 3, 1, 2))
        assert o_nchw.shape == tuple(r.shape)
        np.testing.assert_allclose(o_nchw, r.numpy(), rtol=1e-4, atol=1e-4)


def test_resnet_init_and_shapes():
    model = ResNet(depth=18, out_indices=(0, 1, 2, 3))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    outs = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert [o.shape for o in outs] == [(1, 16, 16, 64), (1, 8, 8, 128),
                                       (1, 4, 4, 256), (1, 2, 2, 512)]
    assert model.output_stride == 32
    assert ResNet(depth=18, strides=(1, 2, 1, 1)).output_stride == 8
    assert model.feat_dim == 512
    assert ResNet(depth=50).feat_dim == 2048


def test_resnet_blockwise_matches_stagewise():
    """all_blocks eval: last block of a stage equals the stage output."""
    model = ResNet(depth=18, strides=(1, 2, 1, 1), out_indices=(2,))
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3),
                    jnp.float32)
    stage_out = model.apply(variables, x, train=False)
    bw = ResNetBlockwise(depth=18, strides=(1, 2, 1, 1), out_indices=(2,))
    blocks = bw.apply(variables, x, train=False)
    assert len(blocks) == 2  # r18 layer3 has 2 blocks
    np.testing.assert_allclose(np.asarray(blocks[-1]),
                               np.asarray(stage_out), rtol=1e-5, atol=1e-5)


def test_vfs_train_ckpt_key_conversion():
    sd = {
        'backbone.conv1.conv.weight': np.zeros(1),
        'backbone.conv1.bn.weight': np.zeros(2),
        'backbone.conv1.bn.running_mean': np.zeros(3),
        'backbone.layer1.0.conv1.conv.weight': np.zeros(4),
        'backbone.layer1.0.conv1.bn.bias': np.zeros(5),
        'backbone.layer2.0.downsample.conv.weight': np.zeros(6),
        'backbone.layer2.0.downsample.bn.running_var': np.zeros(7),
        'img_head.projection_fcs.0.weight': np.zeros(8),  # dropped
    }
    out = vfs_train_ckpt_to_torchvision(sd)
    assert set(out) == {
        'conv1.weight', 'bn1.weight', 'bn1.running_mean',
        'layer1.0.conv1.weight', 'layer1.0.bn1.bias',
        'layer2.0.downsample.0.weight', 'layer2.0.downsample.1.running_var'
    }
