"""Golden parity: CLIPDenseVisionTransformer vs the reference's executable
``CLIPVisionTransformer`` (_modified_BiomedCLIP.py:593-726) restated verbatim
in torch (patch-16 flavour: GN/deconv/SyncBN FPN necks, out-indices taps,
the double-class-embedding quirk, get_embeddings head)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn_t = torch.nn

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from instancediff_tpu.models.clip_vit import OPENAI_MEAN, OPENAI_STD  # noqa: E402
from instancediff_tpu.models.vision_towers import (  # noqa: E402
    CLIPDenseVisionTransformer,
    load_torch_dense_vit_weights,
)

RES, PATCH, WIDTH, HEADS, LAYERS, EMBED = 32, 16, 32, 4, 4, 24
OUT_IDX = (0, 1, 2, 3)


class TorchResBlock(nn_t.Module):  # :371-433, QuickGELU, no mask
    def __init__(self):
        super().__init__()
        self.attn = nn_t.MultiheadAttention(WIDTH, HEADS)
        self.ln_1 = nn_t.LayerNorm(WIDTH)
        self.ln_2 = nn_t.LayerNorm(WIDTH)
        self.c_fc = nn_t.Linear(WIDTH, 4 * WIDTH)
        self.c_proj = nn_t.Linear(4 * WIDTH, WIDTH)

    def forward(self, x):  # LND
        h = self.ln_1(x)
        a, _ = self.attn(h, h, h, need_weights=False)
        x = x + a
        h = self.c_fc(self.ln_2(x))
        h = h * torch.sigmoid(1.702 * h)
        return x + self.c_proj(h)


class TorchDenseViT(nn_t.Module):  # :593-726 verbatim (patch 16)
    def __init__(self):
        super().__init__()
        torch.manual_seed(31)
        scale = WIDTH ** -0.5
        self.conv1 = nn_t.Conv2d(3, WIDTH, PATCH, stride=PATCH, bias=False)
        self.class_embedding = nn_t.Parameter(scale * torch.randn(WIDTH))
        side = RES // PATCH
        self.positional_embedding = nn_t.Parameter(
            scale * torch.randn(side * side + 1, WIDTH))
        self.spatial_size = side
        self.ln_pre = nn_t.LayerNorm(WIDTH)
        self.resblocks = nn_t.ModuleList(
            [TorchResBlock() for _ in range(LAYERS)])
        self.ln_post = nn_t.LayerNorm(WIDTH)
        self.proj = nn_t.Parameter(scale * torch.randn(WIDTH, EMBED))
        self.fpn1 = nn_t.Sequential(
            nn_t.GroupNorm(1, WIDTH),
            nn_t.ConvTranspose2d(WIDTH, WIDTH, 2, stride=2),
            nn_t.BatchNorm2d(WIDTH),  # SyncBatchNorm == BatchNorm off-dist
            nn_t.GELU(),
            nn_t.ConvTranspose2d(WIDTH, WIDTH, 2, stride=2))
        self.fpn2 = nn_t.Sequential(
            nn_t.GroupNorm(1, WIDTH),
            nn_t.ConvTranspose2d(WIDTH, WIDTH, 2, stride=2))
        self.fpn3 = nn_t.GroupNorm(1, WIDTH)
        self.fpn4 = nn_t.Sequential(nn_t.GroupNorm(1, WIDTH),
                                    nn_t.MaxPool2d(2, stride=2))

    def forward(self, x):
        x = self.conv1(x)
        B, C, H, W = x.shape
        x = x.reshape(B, C, -1).permute(0, 2, 1)
        x = torch.cat([self.class_embedding.to(x.dtype)
                       + torch.zeros(B, 1, C, dtype=x.dtype), x], dim=1)
        pos = self.positional_embedding.to(x.dtype)
        cls_pos = pos[0, :] + self.class_embedding.to(x.dtype)
        spatial_pos = torch.nn.functional.interpolate(
            pos[1:].reshape(1, self.spatial_size, self.spatial_size,
                            C).permute(0, 3, 1, 2),
            size=(H, W), mode="bilinear")
        spatial_pos = spatial_pos.reshape(1, C, H * W).permute(0, 2, 1)
        x = x + torch.cat([cls_pos.reshape(1, 1, C), spatial_pos], dim=1)
        x = self.ln_pre(x).permute(1, 0, 2)
        features = []
        for i, blk in enumerate(self.resblocks):
            x = blk(x)
            if i in OUT_IDX:
                xp = x.permute(1, 0, 2)[:, 1:].permute(0, 2, 1).reshape(
                    B, -1, H, W)
                features.append(xp.contiguous())
        for i, op in enumerate((self.fpn1, self.fpn2, self.fpn3, self.fpn4)):
            features[i] = op(features[i])
        x = x.permute(1, 0, 2)
        x = self.ln_post(x) @ self.proj
        features.append([x[:, 0], x[:, 1:].reshape(B, H, W, -1).permute(
            0, 3, 1, 2)])
        return features

    def sd(self):
        d = dict(self.state_dict())
        out = {}
        for k, v in d.items():
            k = k.replace("resblocks.", "transformer.resblocks.")
            k = k.replace(".c_fc.", ".mlp.c_fc.")
            k = k.replace(".c_proj.", ".mlp.c_proj.")
            out[k] = v
        return out


def test_dense_vit_matches_torch():
    net = TorchDenseViT().eval()
    with torch.no_grad():  # randomize BN stats away from 0/1
        net.fpn1[2].running_mean.normal_(0, 0.3)
        net.fpn1[2].running_var.uniform_(0.5, 2.0)
    rng = np.random.default_rng(12)
    img = rng.uniform(-1, 1, (2, RES, RES, 1)).astype(np.float32)
    x01 = np.repeat((img + 1.0) / 2.0, 3, axis=-1)
    xin = ((x01 - np.asarray(OPENAI_MEAN)) / np.asarray(OPENAI_STD))
    with torch.no_grad():
        want = net(torch.from_numpy(
            xin.transpose(0, 3, 1, 2).astype(np.float32)))

    fnet = CLIPDenseVisionTransformer(
        image_size=RES, patch_size=PATCH, width=WIDTH, layers=LAYERS,
        heads=HEADS, output_dim=EMBED, out_indices=OUT_IDX,
        get_embeddings=True)
    params = jax.jit(fnet.init)(jax.random.key(0), jnp.asarray(img))["params"]
    params = load_torch_dense_vit_weights(params, net.sd(), prefix="")
    got = jax.jit(fnet.apply)({"params": params}, jnp.asarray(img))

    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(got[i]).transpose(0, 3, 1, 2), want[i].numpy(),
            atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got[4][0]), want[4][0].numpy(),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got[4][1]).transpose(0, 3, 1, 2), want[4][1].numpy(),
        atol=3e-5, rtol=1e-4)
