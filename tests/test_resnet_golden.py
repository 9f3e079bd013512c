"""Golden parity: CLIPResNetWithAttention / ModifiedResNet vs the reference's
executable torch code (_modified_BiomedCLIP.py:38-311 — Bottleneck, 3-conv
stem, AttentionPool2d with F.multi_head_attention_forward), restated verbatim
in torch with randomized BatchNorm running stats (eval mode) and converted
via ``load_torch_clip_resnet_weights`` onto the FrozenBatchNorm tower."""

from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from torch import nn as nn_t  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from instancediff_tpu.models.vision_towers import (  # noqa: E402
    CLIPResNetWithAttention,
    ModifiedResNet,
    load_torch_clip_resnet_weights,
)

WIDTH, LAYERS, HEADS, OUT, RES = 8, (1, 1, 1, 1), 4, 16, 64


class TorchBottleneck(nn_t.Module):  # reference :38-82 verbatim
    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn_t.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn_t.BatchNorm2d(planes)
        self.conv2 = nn_t.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn_t.BatchNorm2d(planes)
        self.avgpool = nn_t.AvgPool2d(stride) if stride > 1 else nn_t.Identity()
        self.conv3 = nn_t.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn_t.BatchNorm2d(planes * 4)
        self.relu = nn_t.ReLU(inplace=True)
        self.downsample = None
        if stride > 1 or inplanes != planes * 4:
            self.downsample = nn_t.Sequential(OrderedDict([
                ("-1", nn_t.AvgPool2d(stride)),
                ("0", nn_t.Conv2d(inplanes, planes * 4, 1, stride=1, bias=False)),
                ("1", nn_t.BatchNorm2d(planes * 4)),
            ]))

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchAttentionPool2d(nn_t.Module):  # reference :84-135 (equal grids)
    def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
        super().__init__()
        self.positional_embedding = nn_t.Parameter(
            torch.randn(spacial_dim ** 2 + 1, embed_dim) / embed_dim ** 0.5)
        self.k_proj = nn_t.Linear(embed_dim, embed_dim)
        self.q_proj = nn_t.Linear(embed_dim, embed_dim)
        self.v_proj = nn_t.Linear(embed_dim, embed_dim)
        self.c_proj = nn_t.Linear(embed_dim, output_dim)
        self.num_heads = num_heads

    def forward(self, x):
        B, C, H, W = x.shape
        x = x.reshape(B, C, H * W).permute(2, 0, 1)
        x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
        x = x + self.positional_embedding[:, None, :]
        x, _ = F.multi_head_attention_forward(
            query=x, key=x, value=x, embed_dim_to_check=x.shape[-1],
            num_heads=self.num_heads,
            q_proj_weight=self.q_proj.weight, k_proj_weight=self.k_proj.weight,
            v_proj_weight=self.v_proj.weight, in_proj_weight=None,
            in_proj_bias=torch.cat([self.q_proj.bias, self.k_proj.bias,
                                    self.v_proj.bias]),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
            out_proj_weight=self.c_proj.weight, out_proj_bias=self.c_proj.bias,
            use_separate_proj_weight=True, training=False, need_weights=False)
        x = x.permute(1, 2, 0)
        return x[:, :, 0], x[:, :, 1:].reshape(B, -1, H, W)


class TorchCLIPResNet(nn_t.Module):  # reference :179-311 verbatim forward
    def __init__(self):
        super().__init__()
        w = WIDTH
        self.conv1 = nn_t.Conv2d(3, w // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn_t.BatchNorm2d(w // 2)
        self.conv2 = nn_t.Conv2d(w // 2, w // 2, 3, padding=1, bias=False)
        self.bn2 = nn_t.BatchNorm2d(w // 2)
        self.conv3 = nn_t.Conv2d(w // 2, w, 3, padding=1, bias=False)
        self.bn3 = nn_t.BatchNorm2d(w)
        self.avgpool = nn_t.AvgPool2d(2)
        self.relu = nn_t.ReLU(inplace=True)
        self._inplanes = w
        self.layer1 = self._make_layer(w, LAYERS[0])
        self.layer2 = self._make_layer(w * 2, LAYERS[1], stride=2)
        self.layer3 = self._make_layer(w * 4, LAYERS[2], stride=2)
        self.layer4 = self._make_layer(w * 8, LAYERS[3], stride=2)
        self.attnpool = TorchAttentionPool2d(RES // 32, w * 32, HEADS, OUT)

    def _make_layer(self, planes, blocks, stride=1):
        layers = [TorchBottleneck(self._inplanes, planes, stride)]
        self._inplanes = planes * 4
        for _ in range(1, blocks):
            layers.append(TorchBottleneck(self._inplanes, planes))
        return nn_t.Sequential(*layers)

    def forward(self, x):
        for conv, bn in ((self.conv1, self.bn1), (self.conv2, self.bn2),
                         (self.conv3, self.bn3)):
            x = self.relu(bn(conv(x)))
        x = self.avgpool(x)
        outs = []
        for stage in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = stage(x)
            outs.append(x)
        g, _ = self.attnpool(x)
        return outs, g


@pytest.fixture(scope="module")
def torch_net():
    torch.manual_seed(11)
    net = TorchCLIPResNet().eval()
    with torch.no_grad():
        for m in net.modules():  # randomize BN running stats away from 0/1
            if isinstance(m, nn_t.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
    return net


def test_clip_resnet_matches_torch(torch_net):
    rng = np.random.default_rng(5)
    img = rng.standard_normal((2, RES, RES, 3)).astype(np.float32)
    with torch.no_grad():
        outs_t, pooled_t = torch_net(
            torch.from_numpy(img.transpose(0, 3, 1, 2)))

    fnet = CLIPResNetWithAttention(layers=LAYERS, width=WIDTH,
                                   output_dim=OUT, heads=HEADS)
    params = jax.jit(fnet.init)(jax.random.key(0), jnp.asarray(img))["params"]
    params = load_torch_clip_resnet_weights(params, torch_net.state_dict(),
                                            prefix="")
    outs_f, pooled_f = jax.jit(fnet.apply)({"params": params},
                                           jnp.asarray(img))
    for o_f, o_t in zip(outs_f, outs_t):
        np.testing.assert_allclose(np.asarray(o_f).transpose(0, 3, 1, 2),
                                   o_t.numpy(), atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(pooled_f), pooled_t.numpy(),
                               atol=3e-4, rtol=1e-3)


def test_modified_resnet_converter_and_pos_resample(torch_net):
    """ModifiedResNet (trunk-wrapped) accepts the same state dict, and a
    pos-embed grid mismatch takes the reference's bilinear-resample path
    (:262-274) instead of failing."""
    rng = np.random.default_rng(6)
    img128 = rng.standard_normal((1, RES * 2, RES * 2, 3)).astype(np.float32)
    net = ModifiedResNet(layers=LAYERS, width=WIDTH, output_dim=OUT,
                         heads=HEADS)
    params = jax.jit(net.init)(jax.random.key(0),
                               jnp.asarray(img128))["params"]
    params = load_torch_clip_resnet_weights(params, torch_net.state_dict(),
                                            prefix="")
    out = jax.jit(net.apply)({"params": params}, jnp.asarray(img128))
    assert out.shape == (1, OUT) and np.isfinite(np.asarray(out)).all()
