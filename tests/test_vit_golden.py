"""Golden parity: CLIPVisionTower vs executable torch restatements of BOTH
reference ViT provenances:

* timm/BiomedCLIP flavour (vendored timm_model.py trunk): pre-LN blocks with
  fused qkv, EXACT erf GELU, LayerNorm eps 1e-6, no ln_pre, head Linear.
* OpenAI CLIP flavour (_modified_BiomedCLIP.py CLIPVisionTransformer /
  torch.jit ViT archives): QuickGELU, eps 1e-5, visual.ln_pre before the
  transformer, ``x @ visual.proj``.

Each restatement is converted through ``load_torch_clip_vision_weights`` and
must match the flax tower end-to-end on the same [-1,1] grayscale input.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn_t = torch.nn

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from instancediff_tpu.models.clip_vit import (  # noqa: E402
    OPENAI_MEAN,
    OPENAI_STD,
    CLIPVisionTower,
    load_torch_clip_vision_weights,
)

RES, PATCH, WIDTH, HEADS, LAYERS, EMBED = 32, 8, 32, 4, 2, 24


def _preprocessed(img_pm1):
    """Replicate the tower's on-device [-1,1] -> OpenAI normalisation as the
    torch models' input (NCHW)."""
    x01 = (img_pm1 + 1.0) / 2.0
    x01 = np.repeat(x01, 3, axis=-1)
    x = (x01 - np.asarray(OPENAI_MEAN)) / np.asarray(OPENAI_STD)
    return torch.from_numpy(x.transpose(0, 3, 1, 2).astype(np.float32))


class TimmBlock(nn_t.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = nn_t.LayerNorm(WIDTH, eps=1e-6)
        self.norm2 = nn_t.LayerNorm(WIDTH, eps=1e-6)
        self.qkv = nn_t.Linear(WIDTH, 3 * WIDTH)
        self.proj = nn_t.Linear(WIDTH, WIDTH)
        self.fc1 = nn_t.Linear(WIDTH, 4 * WIDTH)
        self.fc2 = nn_t.Linear(4 * WIDTH, WIDTH)

    def attn(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, HEADS, C // HEADS)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        a = (q @ k.transpose(-2, -1)) * (C // HEADS) ** -0.5
        a = a.softmax(dim=-1)
        return self.proj((a @ v).transpose(1, 2).reshape(B, N, C))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        h = self.fc1(self.norm2(x))
        h = torch.nn.functional.gelu(h)  # exact erf GELU
        return x + self.fc2(h)


class TimmViT(nn_t.Module):
    def __init__(self):
        super().__init__()
        torch.manual_seed(21)
        self.patch = nn_t.Conv2d(3, WIDTH, PATCH, stride=PATCH)
        self.cls = nn_t.Parameter(torch.randn(1, 1, WIDTH) * 0.02)
        g = (RES // PATCH) ** 2
        self.pos = nn_t.Parameter(torch.randn(1, g + 1, WIDTH) * 0.02)
        self.blocks = nn_t.ModuleList([TimmBlock() for _ in range(LAYERS)])
        self.norm = nn_t.LayerNorm(WIDTH, eps=1e-6)
        self.head = nn_t.Linear(WIDTH, EMBED, bias=False)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls.expand(B, -1, -1), x], dim=1) + self.pos
        for blk in self.blocks:
            x = blk(x)
        return self.head(self.norm(x)[:, 0])

    def sd(self):
        d = {
            "visual.trunk.patch_embed.proj.weight": self.patch.weight,
            "visual.trunk.patch_embed.proj.bias": self.patch.bias,
            "visual.trunk.cls_token": self.cls,
            "visual.trunk.pos_embed": self.pos,
            "visual.trunk.norm.weight": self.norm.weight,
            "visual.trunk.norm.bias": self.norm.bias,
            "visual.head.proj.weight": self.head.weight,
        }
        for i, b in enumerate(self.blocks):
            T = f"visual.trunk.blocks.{i}."
            d.update({
                T + "norm1.weight": b.norm1.weight, T + "norm1.bias": b.norm1.bias,
                T + "norm2.weight": b.norm2.weight, T + "norm2.bias": b.norm2.bias,
                T + "attn.qkv.weight": b.qkv.weight, T + "attn.qkv.bias": b.qkv.bias,
                T + "attn.proj.weight": b.proj.weight, T + "attn.proj.bias": b.proj.bias,
                T + "mlp.fc1.weight": b.fc1.weight, T + "mlp.fc1.bias": b.fc1.bias,
                T + "mlp.fc2.weight": b.fc2.weight, T + "mlp.fc2.bias": b.fc2.bias,
            })
        return d


class OpenAIViT(nn_t.Module):
    """Reference CLIPVisionTransformer semantics (:593-660 / OpenAI jit)."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(22)
        self.conv1 = nn_t.Conv2d(3, WIDTH, PATCH, stride=PATCH, bias=False)
        self.class_embedding = nn_t.Parameter(torch.randn(WIDTH) * 0.02)
        g = (RES // PATCH) ** 2
        self.positional_embedding = nn_t.Parameter(torch.randn(g + 1, WIDTH) * 0.02)
        self.ln_pre = nn_t.LayerNorm(WIDTH)
        self.resblocks = nn_t.ModuleList(
            [nn_t.MultiheadAttention(WIDTH, HEADS) for _ in range(LAYERS)])
        self.lns = nn_t.ModuleList(
            [nn_t.ModuleList([nn_t.LayerNorm(WIDTH), nn_t.LayerNorm(WIDTH)])
             for _ in range(LAYERS)])
        self.mlps = nn_t.ModuleList(
            [nn_t.ModuleList([nn_t.Linear(WIDTH, 4 * WIDTH),
                              nn_t.Linear(4 * WIDTH, WIDTH)])
             for _ in range(LAYERS)])
        self.ln_post = nn_t.LayerNorm(WIDTH)
        self.proj = nn_t.Parameter(torch.randn(WIDTH, EMBED) * 0.02)

    def forward(self, x):
        B = x.shape[0]
        x = self.conv1(x).flatten(2).transpose(1, 2)
        cls = self.class_embedding[None, None].expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding[None]
        x = self.ln_pre(x).transpose(0, 1)  # LND
        for attn, (ln1, ln2), (fc, proj) in zip(self.resblocks, self.lns,
                                                self.mlps):
            h = ln1(x)
            a, _ = attn(h, h, h, need_weights=False)
            x = x + a
            h = fc(ln2(x))
            h = h * torch.sigmoid(1.702 * h)  # QuickGELU
            x = x + proj(h)
        x = x.transpose(0, 1)
        return self.ln_post(x)[:, 0] @ self.proj

    def sd(self):
        d = {
            "visual.conv1.weight": self.conv1.weight,
            "visual.class_embedding": self.class_embedding,
            "visual.positional_embedding": self.positional_embedding,
            "visual.ln_pre.weight": self.ln_pre.weight,
            "visual.ln_pre.bias": self.ln_pre.bias,
            "visual.ln_post.weight": self.ln_post.weight,
            "visual.ln_post.bias": self.ln_post.bias,
            "visual.proj": self.proj,
        }
        for i in range(LAYERS):
            R = f"visual.transformer.resblocks.{i}."
            attn, (ln1, ln2), (fc, proj) = (self.resblocks[i], self.lns[i],
                                            self.mlps[i])
            d.update({
                R + "attn.in_proj_weight": attn.in_proj_weight,
                R + "attn.in_proj_bias": attn.in_proj_bias,
                R + "attn.out_proj.weight": attn.out_proj.weight,
                R + "attn.out_proj.bias": attn.out_proj.bias,
                R + "ln_1.weight": ln1.weight, R + "ln_1.bias": ln1.bias,
                R + "ln_2.weight": ln2.weight, R + "ln_2.bias": ln2.bias,
                R + "mlp.c_fc.weight": fc.weight, R + "mlp.c_fc.bias": fc.bias,
                R + "mlp.c_proj.weight": proj.weight,
                R + "mlp.c_proj.bias": proj.bias,
            })
        return d


def _run_flax(tower, sd, img):
    params = jax.jit(tower.init)(jax.random.key(0), jnp.asarray(img))
    params = load_torch_clip_vision_weights(params, sd)
    return np.asarray(jax.jit(tower.apply)(params, jnp.asarray(img)))


def test_timm_vit_tower_matches_torch():
    net = TimmViT().eval()
    rng = np.random.default_rng(8)
    img = (rng.uniform(-1, 1, (2, RES, RES, 1))).astype(np.float32)
    with torch.no_grad():
        want = net(_preprocessed(img)).numpy()
    tower = CLIPVisionTower(image_size=RES, patch_size=PATCH, width=WIDTH,
                            layers=LAYERS, heads=HEADS, embed_dim=EMBED,
                            act="gelu", ln_eps=1e-6, use_ln_pre=False)
    got = _run_flax(tower, net.sd(), img)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_openai_vit_tower_matches_torch():
    net = OpenAIViT().eval()
    rng = np.random.default_rng(9)
    img = (rng.uniform(-1, 1, (2, RES, RES, 1))).astype(np.float32)
    with torch.no_grad():
        want = net(_preprocessed(img)).numpy()
    tower = CLIPVisionTower(image_size=RES, patch_size=PATCH, width=WIDTH,
                            layers=LAYERS, heads=HEADS, embed_dim=EMBED,
                            act="quick_gelu", ln_eps=1e-5, use_ln_pre=True)
    got = _run_flax(tower, net.sd(), img)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
