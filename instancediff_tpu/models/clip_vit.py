"""CLIP/BiomedCLIP image tower: ViT-B/16 in flax.

TPU-native equivalent of the vendored open_clip vision stack
(models/BiomedCLIP/model.py:104-170 builds a timm ``vit_base_patch16_224``
trunk per BiomedCLIP_config.json:5; transformer.py:15-803 holds the
primitives). Its role in the framework: compute the degraded image's CLIP
embedding ``emb_A`` **on device** inside the jitted step/sampler, replacing
the reference's precomputed-file channel (MedSpeckle.py:46; BASELINE.json
north star).

Structure (ViT-B/16, matching timm/open_clip):
  patchify 16x16 -> + class token + learned pos embed -> 12 pre-LN
  transformer blocks (width 768, heads 12, GELU MLP x4) -> final LN ->
  class-token pooling -> linear projection to the 512-d shared space.
Grayscale medical inputs are broadcast to 3 channels and normalised with the
OpenAI CLIP mean/std (transform.py PreprocessCfg) on device.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .text_encoder import TransformerBlock

OPENAI_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_STD = (0.26862954, 0.26130258, 0.27577711)


def patch_dropout_tokens(key, x, prob: float, exclude_first_token: bool = True):
    """Training-time PatchDropout (vendored transformer.py:49-86): keep a
    per-sample random subset of ``max(1, int(N * (1-prob)))`` tokens, the
    first (cls) token always kept when ``exclude_first_token``. Token order
    follows the random draw, as in the reference's ``randn().topk`` indices.
    Static output shape — XLA-friendly."""
    assert 0.0 <= prob < 1.0
    if prob == 0.0:
        return x
    if exclude_first_token:
        cls_tok, patches = x[:, :1], x[:, 1:]
    else:
        cls_tok, patches = x[:, :0], x
    B, n_tok = patches.shape[0], patches.shape[1]
    num_keep = max(1, int(n_tok * (1.0 - prob)))
    rand = jax.random.normal(key, (B, n_tok))
    _, keep_idx = jax.lax.top_k(rand, num_keep)
    patches = jnp.take_along_axis(patches, keep_idx[..., None], axis=1)
    return jnp.concatenate([cls_tok, patches], axis=1)


class CLIPVisionTower(nn.Module):
    """ViT image encoder. ``__call__(images [B,H,W,C in [-1,1]]) -> [B, embed_dim]``."""

    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512
    act: str = "gelu"  # timm ViT uses GELU; OpenAI CLIP uses QuickGELU
    pos_embed_type: str = "learnable"  # or 'sin_cos_2d' (model.py:41)
    # timm ViT LayerNorms use eps 1e-6; OpenAI visual towers use 1e-5
    ln_eps: float = 1e-6
    # OpenAI CLIP ViTs normalise token embeddings BEFORE the transformer
    # (visual.ln_pre); timm/BiomedCLIP ViTs don't
    use_ln_pre: bool = False
    # PatchDropout (vendored transformer.py:49-86, applied between pos-embed
    # and ln_pre at :512): training-only random token subset, cls excluded.
    # Needs a 'patch_dropout' rng and deterministic=False to be active.
    patch_dropout: float = 0.0
    # LayerScale per-branch gammas (transformer.py:39-47 via ls_init_value)
    ls_init: float | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        B, H, W, C = images.shape
        # [-1,1] -> [0,1] -> OpenAI normalisation, grayscale -> RGB broadcast
        x01 = (images + 1.0) / 2.0
        if C == 1:
            x01 = jnp.repeat(x01, 3, axis=-1)
        mean = jnp.asarray(OPENAI_MEAN, x01.dtype)
        std = jnp.asarray(OPENAI_STD, x01.dtype)
        x = (x01 - mean) / std

        x = nn.Conv(self.width, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), use_bias=True,
                    dtype=self.dtype, name="patch_embed")(x.astype(self.dtype))
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(B, gh * gw, self.width)

        cls = self.param("class_token", nn.initializers.normal(0.02), (1, 1, self.width))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.width)).astype(x.dtype), x],
                            axis=1)
        n_pos = gh * gw + 1
        if self.pos_embed_type == "sin_cos_2d":
            # fixed 2D sin-cos table (vendored model.py:41 option); stored as
            # a param for checkpoint-layout parity but initialised to the
            # closed form and typically frozen with the rest of the tower
            from .pos_embed import get_2d_sincos_pos_embed

            table = get_2d_sincos_pos_embed(self.width, gh, cls_token=True)
            pos = self.param("pos_embed", lambda rng, shape: jnp.asarray(table),
                             (n_pos, self.width))
        else:
            pos = self.param("pos_embed", nn.initializers.normal(0.02),
                             (n_pos, self.width))
        x = x + pos[None].astype(x.dtype)

        if self.patch_dropout > 0.0 and not deterministic:
            x = patch_dropout_tokens(self.make_rng("patch_dropout"), x,
                                     self.patch_dropout)

        if self.use_ln_pre:
            x = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32,
                             name="ln_pre")(x)
        for i in range(self.layers):
            x = TransformerBlock(self.width, self.heads, act=self.act,
                                 ln_eps=self.ln_eps, ls_init=self.ls_init,
                                 dtype=self.dtype, name=f"block_{i}")(
                                     x, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=jnp.float32,
                         name="ln_post")(x)
        pooled = x[:, 0]  # class-token pooling (timm 'token' pool)
        out = nn.Dense(self.embed_dim, use_bias=False, dtype=self.dtype, name="proj")(pooled)
        return out


def build_image_tower(embed_dim=512, tiny=False, dtype=jnp.float32):
    """Factory; ``tiny`` shrinks for tests."""
    if tiny:
        return CLIPVisionTower(image_size=32, patch_size=8, width=32, layers=2,
                               heads=4, embed_dim=embed_dim, dtype=dtype)
    return CLIPVisionTower(embed_dim=embed_dim, dtype=dtype)


def encode_image_fn(tower, params, normalize=True):
    """Return ``f(images) -> emb [B,1,E]`` matching the ``A_emb`` channel shape
    (MedSpeckle.py:46 reshape(1,-1) per sample)."""

    def f(images):
        emb = tower.apply(params, images)
        if normalize:
            emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True).clip(1e-8)
        return emb[:, None, :]

    return f


def load_torch_clip_vision_weights(params, checkpoint_path_or_sd):
    """Convert a torch open_clip/timm/OpenAI ViT state dict (.bin/.pt path,
    torch.jit archive path, or an already-loaded mapping) into this tower's
    param tree when the asset exists (the reference ships no weights —
    models/BiomedCLIP/open_clip_pytorch_model.bin is an unreleased TODO).
    Returns updated params; raises FileNotFoundError when absent."""
    import os

    if isinstance(checkpoint_path_or_sd, (str, os.PathLike)):
        if not os.path.isfile(checkpoint_path_or_sd):
            raise FileNotFoundError(checkpoint_path_or_sd)
        import torch  # CPU-only torch is available in this image

        try:
            sd = torch.load(checkpoint_path_or_sd, map_location="cpu")
        except RuntimeError:
            # OpenAI ships torch.jit archives (reference openai.py:62-68)
            sd = torch.jit.load(checkpoint_path_or_sd,
                                map_location="cpu").eval()
    else:
        sd = checkpoint_path_or_sd
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    def to_np(t):
        return jnp.asarray(t.detach().cpu().float().numpy())

    new = jax.tree.map(lambda x: x, params)  # shallow copy
    inner = new["params"]

    def key_like(*cands):
        for c in cands:
            if c in sd:
                return c
        return None

    k = key_like("visual.trunk.patch_embed.proj.weight", "visual.conv1.weight")
    if k:
        w = to_np(sd[k])  # [width, 3, P, P] -> [P, P, 3, width]
        inner["patch_embed"]["kernel"] = jnp.transpose(w, (2, 3, 1, 0))
        bk = k.replace("weight", "bias")
        if bk in sd:
            inner["patch_embed"]["bias"] = to_np(sd[bk])
        else:  # OpenAI conv1 is bias-free; zero ours for exactness
            inner["patch_embed"]["bias"] = jnp.zeros_like(
                inner["patch_embed"]["bias"])
    k = key_like("visual.trunk.cls_token", "visual.class_embedding")
    if k:
        inner["class_token"] = to_np(sd[k]).reshape(1, 1, -1)
    k = key_like("visual.trunk.pos_embed", "visual.positional_embedding")
    if k:
        pos = to_np(sd[k]).reshape(-1, inner["pos_embed"].shape[-1])
        if pos.shape[0] != inner["pos_embed"].shape[0]:
            # tower resolution != checkpoint resolution: keep the cls row,
            # bicubic-resample the grid rows (reference pos_embed.py:75-96)
            from .pos_embed import interpolate_pos_embed

            pos = interpolate_pos_embed(pos, inner["pos_embed"].shape[0],
                                        n_prefix=1)
        inner["pos_embed"] = pos
    k = key_like("visual.head.proj.weight", "visual.proj")
    if k:
        w = to_np(sd[k])
        inner["proj"]["kernel"] = w.T if w.shape[0] == inner["proj"]["kernel"].shape[1] else w

    # OpenAI visual towers: pre-transformer LayerNorm + resblocks naming
    # (torch.jit archives: visual.ln_pre / visual.transformer.resblocks.*)
    if "visual.ln_pre.weight" in sd and "ln_pre" in inner:
        inner["ln_pre"]["scale"] = to_np(sd["visual.ln_pre.weight"])
        inner["ln_pre"]["bias"] = to_np(sd["visual.ln_pre.bias"])
    i = -1
    while (f"visual.transformer.resblocks.{i + 1}.ln_1.weight" in sd
           and f"block_{i + 1}" in inner):  # ckpt may be deeper than tower
        i += 1
        R = f"visual.transformer.resblocks.{i}"
        blk = inner[f"block_{i}"]
        for hf, ours in ((f"{R}.ln_1", "ln_1"), (f"{R}.ln_2", "ln_2")):
            blk[ours]["scale"] = to_np(sd[hf + ".weight"])
            blk[ours]["bias"] = to_np(sd[hf + ".bias"])
        w = to_np(sd[f"{R}.attn.in_proj_weight"])
        b = to_np(sd[f"{R}.attn.in_proj_bias"])
        for name, wpart, bpart in zip(("q_proj", "k_proj", "v_proj"),
                                      jnp.split(w, 3, axis=0),
                                      jnp.split(b, 3, axis=0)):
            blk[name]["kernel"], blk[name]["bias"] = wpart.T, bpart
        blk["out_proj"]["kernel"] = to_np(sd[f"{R}.attn.out_proj.weight"]).T
        blk["out_proj"]["bias"] = to_np(sd[f"{R}.attn.out_proj.bias"])
        blk["fc"]["kernel"] = to_np(sd[f"{R}.mlp.c_fc.weight"]).T
        blk["fc"]["bias"] = to_np(sd[f"{R}.mlp.c_fc.bias"])
        blk["proj"]["kernel"] = to_np(sd[f"{R}.mlp.c_proj.weight"]).T
        blk["proj"]["bias"] = to_np(sd[f"{R}.mlp.c_proj.bias"])
        # LayerScale gammas (open_clip naming), present when the checkpoint
        # was trained with ls_init_value (vendored transformer.py:203,214)
        for tn, on in ((f"{R}.ls_1.gamma", "ls_1"), (f"{R}.ls_2.gamma", "ls_2")):
            if tn in sd and on in blk:
                blk[on] = to_np(sd[tn])
    if "visual.ln_post.weight" in sd:
        inner["ln_post"]["scale"] = to_np(sd["visual.ln_post.weight"])
        inner["ln_post"]["bias"] = to_np(sd["visual.ln_post.bias"])

    for i in range(12):
        for hf, ours, transpose in (
            (f"visual.trunk.blocks.{i}.norm1", f"block_{i}/ln_1", False),
            (f"visual.trunk.blocks.{i}.norm2", f"block_{i}/ln_2", False),
        ):
            wk, bk = hf + ".weight", hf + ".bias"
            if wk in sd:
                mod, sub = ours.split("/")
                inner[mod][sub]["scale"] = to_np(sd[wk])
                inner[mod][sub]["bias"] = to_np(sd[bk])
        qkv_w = f"visual.trunk.blocks.{i}.attn.qkv.weight"
        if qkv_w in sd:
            w = to_np(sd[qkv_w])  # [3*width, width]
            width = w.shape[1]
            qw, kw, vw = jnp.split(w, 3, axis=0)
            b = to_np(sd[qkv_w.replace("weight", "bias")])
            qb, kb, vb = jnp.split(b, 3, axis=0)
            blk = inner[f"block_{i}"]
            blk["q_proj"]["kernel"], blk["q_proj"]["bias"] = qw.T, qb
            blk["k_proj"]["kernel"], blk["k_proj"]["bias"] = kw.T, kb
            blk["v_proj"]["kernel"], blk["v_proj"]["bias"] = vw.T, vb
            ow = f"visual.trunk.blocks.{i}.attn.proj.weight"
            blk["out_proj"]["kernel"] = to_np(sd[ow]).T
            blk["out_proj"]["bias"] = to_np(sd[ow.replace("weight", "bias")])
            f1 = f"visual.trunk.blocks.{i}.mlp.fc1.weight"
            f2 = f"visual.trunk.blocks.{i}.mlp.fc2.weight"
            blk["fc"]["kernel"] = to_np(sd[f1]).T
            blk["fc"]["bias"] = to_np(sd[f1.replace("weight", "bias")])
            blk["proj"]["kernel"] = to_np(sd[f2]).T
            blk["proj"]["bias"] = to_np(sd[f2.replace("weight", "bias")])
            # LayerScale gammas (timm naming: ls1/ls2)
            for tn, on in ((f"visual.trunk.blocks.{i}.ls1.gamma", "ls_1"),
                           (f"visual.trunk.blocks.{i}.ls2.gamma", "ls_2")):
                if tn in sd and on in blk:
                    blk[on] = to_np(sd[tn])
    k = key_like("visual.trunk.norm.weight")
    if k:
        inner["ln_post"]["scale"] = to_np(sd[k])
        inner["ln_post"]["bias"] = to_np(sd[k.replace("weight", "bias")])
    return new
