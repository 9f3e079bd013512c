"""Tests for the open_clip-fork breadth analogues: preprocessing transforms,
the pretrained registry, the OpenAI loader and the big_vision (SigLIP)
loader (reference models/BiomedCLIP/BiomedCLIP/{transform,pretrained,openai,
big_vision}.py)."""

import os

import numpy as np
import pytest

from instancediff_tpu.data.transforms import (
    AugmentationCfg,
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
    PreprocessCfg,
    image_transform,
    image_transform_v2,
    merge_preprocess_dict,
)


def _img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def test_eval_transform_shortest_shape_and_norm():
    fn = image_transform(32, is_train=False)
    out = fn(_img(48, 64))
    assert out.shape == (32, 32, 3)
    # inverse-normalizing must land in [0, 1]
    inv = out * np.asarray(OPENAI_DATASET_STD) + np.asarray(OPENAI_DATASET_MEAN)
    assert inv.min() >= -1e-5 and inv.max() <= 1 + 1e-5


def test_eval_transform_modes():
    sq = image_transform(32, is_train=False, resize_mode="squash")(_img(40, 80))
    assert sq.shape == (32, 32, 3)
    lg = image_transform(32, is_train=False, resize_mode="longest",
                         fill_color=0)(_img(40, 80))
    assert lg.shape == (32, 32, 3)
    # longest mode pads the short side with fill_color -> normalized zeros
    pad_val = (0.0 - np.asarray(OPENAI_DATASET_MEAN)) / np.asarray(OPENAI_DATASET_STD)
    np.testing.assert_allclose(lg[0, 16], pad_val, atol=1e-5)


def test_train_transform_deterministic_and_gray():
    fn = image_transform(16, is_train=True,
                         aug_cfg=AugmentationCfg(scale=(0.5, 1.0),
                                                 gray_scale_prob=1.0))
    a = fn(_img(40, 40), rng=np.random.default_rng(7))
    b = fn(_img(40, 40), rng=np.random.default_rng(7))
    c = fn(_img(40, 40), rng=np.random.default_rng(8))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0
    # gray_scale_prob=1: all channels equal pre-normalization
    un = a * np.asarray(OPENAI_DATASET_STD) + np.asarray(OPENAI_DATASET_MEAN)
    np.testing.assert_allclose(un[..., 0], un[..., 1], atol=1e-5)


def test_train_transform_color_jitter_runs():
    fn = image_transform(16, is_train=True,
                         aug_cfg={"scale": (0.8, 1.0),
                                  "color_jitter": (0.4, 0.4, 0.4, 0.1),
                                  "color_jitter_prob": 1.0})
    out = fn(_img(32, 32), rng=np.random.default_rng(3))
    assert out.shape == (16, 16, 3) and np.isfinite(out).all()


def test_preprocess_cfg_merge():
    cfg = PreprocessCfg()
    merged = merge_preprocess_dict(cfg, {"size": 96, "bogus": 1,
                                         "interpolation": None})
    assert merged["size"] == 96 and "bogus" not in merged
    assert merged["interpolation"] == "bicubic"  # None overlay dropped
    assert cfg.input_size == (224, 224, 3)
    fn = image_transform_v2(PreprocessCfg(size=24), is_train=False)
    assert fn(_img(30, 50)).shape == (24, 24, 3)


def test_pretrained_registry_queries():
    from instancediff_tpu.models import pretrained as P

    pairs = P.list_pretrained()
    assert ("ViT-B-32", "openai") in pairs
    assert "ViT-B-32:openai" in P.list_pretrained(as_str=True)
    assert "ViT-B-32" in P.list_pretrained_models_by_tag("openai")
    assert "openai" in P.list_pretrained_tags_by_model("ViT-B-32")
    assert P.is_pretrained_cfg("ViT-B-32", "OpenAI")  # tag cleaning
    assert P.get_pretrained_url("ViT-B-32", "openai").startswith("https://")
    cfg = P.get_pretrained_cfg("ViT-B-16-SigLIP", "webli")
    assert cfg["resize_mode"] == "squash"  # _slpcfg family


def test_pretrained_registry_converters_resolve():
    """Every registry row's converter string names a real callable in this
    package (module.function, resolved the way consumers would)."""
    import importlib

    from instancediff_tpu.models import pretrained as P

    for model, tag in P.list_pretrained():
        cfg = P.get_pretrained_cfg(model, tag)
        conv = cfg.get("converter")
        if conv is None:
            continue
        mod_name, _, fn_name = conv.rpartition(".")
        mod = importlib.import_module(f"instancediff_tpu.models.{mod_name}")
        assert callable(getattr(mod, fn_name)), conv
        # the npz-only big_vision loader must be paired with an .npz asset
        if fn_name == "load_big_vision_weights":
            assert cfg["filename"].endswith(".npz"), (model, tag)


def test_pretrained_local_resolution(tmp_path):
    from instancediff_tpu.models import pretrained as P

    cfg = P.get_pretrained_cfg("ViT-B-32", "openai")
    with pytest.raises(FileNotFoundError) as e:
        P.download_pretrained(cfg, cache_dir=str(tmp_path))
    assert "no egress" in str(e.value)
    (tmp_path / "ViT-B-32.pt").write_bytes(b"x")
    path, cfg2 = P.resolve_pretrained("ViT-B-32", "openai",
                                      cache_dir=str(tmp_path))
    assert path == str(tmp_path / "ViT-B-32.pt")
    assert cfg2["converter"] == "text_encoder.load_torch_clip_text_weights"
    with pytest.raises(KeyError):
        P.resolve_pretrained("ViT-B-32", "nope")


def _tiny_openai_sd(width=32, layers=2, vocab=512, ctx=77, embed=512,
                    patch=8, grid=4):
    import torch

    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    sd = {
        "token_embedding.weight": t(vocab, width),
        "positional_embedding": t(ctx, width),
        "ln_final.weight": t(width), "ln_final.bias": t(width),
        "text_projection": t(width, embed),
        "logit_scale": torch.tensor(2.5),
        "visual.conv1.weight": t(width, 3, patch, patch),
        "visual.class_embedding": t(width),
        "visual.positional_embedding": t(grid * grid + 1, width),
        "visual.proj": t(width, embed),
        "visual.trunk.norm.weight": t(width),
        "visual.trunk.norm.bias": t(width),
    }
    for i in range(layers):
        R = f"transformer.resblocks.{i}."
        sd.update({
            R + "attn.in_proj_weight": t(3 * width, width),
            R + "attn.in_proj_bias": t(3 * width),
            R + "attn.out_proj.weight": t(width, width),
            R + "attn.out_proj.bias": t(width),
            R + "mlp.c_fc.weight": t(4 * width, width),
            R + "mlp.c_fc.bias": t(4 * width),
            R + "mlp.c_proj.weight": t(width, 4 * width),
            R + "mlp.c_proj.bias": t(width),
            R + "ln_1.weight": t(width), R + "ln_1.bias": t(width),
            R + "ln_2.weight": t(width), R + "ln_2.bias": t(width),
        })
        V = f"visual.trunk.blocks.{i}."
        sd.update({
            V + "norm1.weight": t(width), V + "norm1.bias": t(width),
            V + "norm2.weight": t(width), V + "norm2.bias": t(width),
            V + "attn.qkv.weight": t(3 * width, width),
            V + "attn.qkv.bias": t(3 * width),
            V + "attn.proj.weight": t(width, width),
            V + "attn.proj.bias": t(width),
            V + "mlp.fc1.weight": t(4 * width, width),
            V + "mlp.fc1.bias": t(4 * width),
            V + "mlp.fc2.weight": t(width, 4 * width),
            V + "mlp.fc2.bias": t(width),
        })
    return sd


def test_load_openai_model_from_synthetic_checkpoint(tmp_path):
    """End-to-end: registry-shaped checkpoint on disk -> converted towers ->
    both encoders run and the text weights verifiably landed."""
    import torch

    from instancediff_tpu.models.openai import list_openai_models, load_openai_model

    assert "ViT-B-32" in list_openai_models()
    sd = _tiny_openai_sd()
    path = tmp_path / "tiny_clip.pt"
    torch.save(sd, str(path))
    model, preprocess = load_openai_model(str(path), tiny=True)
    assert abs(model.logit_scale - 2.5) < 1e-6
    emb_t = np.asarray(model.encode_text(["speckle in OCT", "noise"]))
    assert emb_t.shape == (2, 512) and np.isfinite(emb_t).all()
    emb_i = np.asarray(model.encode_image(np.zeros((1, 32, 32, 1), np.float32)))
    assert emb_i.shape == (1, 512) and np.isfinite(emb_i).all()
    got = np.asarray(model.text_params["params"]["token_embedding"]["embedding"])
    np.testing.assert_allclose(got, sd["token_embedding.weight"].numpy(),
                               atol=1e-6)
    out = preprocess(_img(40, 50))
    assert out.shape == (224, 224, 3)


def test_load_openai_model_unknown_name():
    from instancediff_tpu.models.openai import load_openai_model

    with pytest.raises(RuntimeError):
        load_openai_model("NoSuchModel-Z9")


def _tiny_big_vision_npz(path, width=32, layers=2, heads=4, patch=8, grid=4):
    rng = np.random.default_rng(0)
    hd = width // heads
    w = {}

    def t(*shape):
        return rng.standard_normal(shape).astype(np.float32) * 0.05

    p = "params/img/"
    w[p + "embedding/kernel"] = t(patch, patch, 3, width)
    w[p + "embedding/bias"] = t(width)
    w[p + "pos_embedding"] = t(1, grid * grid, width)  # cls-free (SigLIP)
    w[p + "Transformer/encoder_norm/scale"] = t(width)
    w[p + "Transformer/encoder_norm/bias"] = t(width)
    w[p + "MAPHead_0/probe"] = t(1, 1, width)
    for i in range(layers):
        bp = f"{p}Transformer/encoderblock_{i}/"
        mha = bp + "MultiHeadDotProductAttention_0/"
        w[bp + "LayerNorm_0/scale"] = t(width)
        w[bp + "LayerNorm_0/bias"] = t(width)
        w[bp + "LayerNorm_1/scale"] = t(width)
        w[bp + "LayerNorm_1/bias"] = t(width)
        for n in ("query", "key", "value"):
            w[mha + n + "/kernel"] = t(width, heads, hd)
            w[mha + n + "/bias"] = t(heads, hd)
        w[mha + "out/kernel"] = t(heads, hd, width)
        w[mha + "out/bias"] = t(width)
        w[bp + "MlpBlock_0/Dense_0/kernel"] = t(width, 4 * width)
        w[bp + "MlpBlock_0/Dense_0/bias"] = t(4 * width)
        w[bp + "MlpBlock_0/Dense_1/kernel"] = t(4 * width, width)
        w[bp + "MlpBlock_0/Dense_1/bias"] = t(width)
    np.savez(path, **w)
    return w


def test_load_big_vision_weights(tmp_path):
    import jax
    import jax.numpy as jnp

    from instancediff_tpu.models.big_vision import load_big_vision_weights
    from instancediff_tpu.models.clip_vit import CLIPVisionTower

    tower = CLIPVisionTower(image_size=32, patch_size=8, width=32, layers=2,
                            heads=4, embed_dim=16)
    params = tower.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
    path = str(tmp_path / "siglip.npz")
    src = _tiny_big_vision_npz(path)
    new, skipped = load_big_vision_weights(params, path)
    inner = new["params"]
    np.testing.assert_allclose(
        np.asarray(inner["patch_embed"]["kernel"]),
        src["params/img/embedding/kernel"], atol=1e-6)
    # fused [width, heads, hd] attention kernels land as [width, width]
    np.testing.assert_allclose(
        np.asarray(inner["block_0"]["q_proj"]["kernel"]),
        src["params/img/Transformer/encoderblock_0/"
            "MultiHeadDotProductAttention_0/query/kernel"].reshape(32, 32),
        atol=1e-6)
    assert any("MAPHead" in s for s in skipped)
    out = tower.apply(new, jnp.zeros((1, 32, 32, 1)))
    assert out.shape == (1, 16) and np.isfinite(np.asarray(out)).all()
    with pytest.raises(KeyError):
        load_big_vision_weights(params, path, prefix="params/txt/")


def _tiny_openai_rn_sd(width=8, embed=512):
    """Synthetic OpenAI RN-family checkpoint (text tower + ModifiedResNet
    visual with one bottleneck per stage)."""
    import torch

    g = torch.Generator().manual_seed(1)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    def bn(prefix, c, sd):
        sd[f"{prefix}.weight"] = t(c)
        sd[f"{prefix}.bias"] = t(c)
        sd[f"{prefix}.running_mean"] = t(c)
        sd[f"{prefix}.running_var"] = t(c).abs() + 0.5

    sd = {
        "token_embedding.weight": t(512, 32),
        "positional_embedding": t(77, 32),
        "ln_final.weight": t(32), "ln_final.bias": t(32),
        "text_projection": t(32, embed),
        "logit_scale": torch.tensor(2.0),
    }
    for i in range(2):
        R = f"transformer.resblocks.{i}."
        sd.update({
            R + "attn.in_proj_weight": t(96, 32),
            R + "attn.in_proj_bias": t(96),
            R + "attn.out_proj.weight": t(32, 32),
            R + "attn.out_proj.bias": t(32),
            R + "mlp.c_fc.weight": t(128, 32), R + "mlp.c_fc.bias": t(128),
            R + "mlp.c_proj.weight": t(32, 128), R + "mlp.c_proj.bias": t(32),
            R + "ln_1.weight": t(32), R + "ln_1.bias": t(32),
            R + "ln_2.weight": t(32), R + "ln_2.bias": t(32),
        })
    w = width
    sd["visual.conv1.weight"] = t(w // 2, 3, 3, 3)
    bn("visual.bn1", w // 2, sd)
    sd["visual.conv2.weight"] = t(w // 2, w // 2, 3, 3)
    bn("visual.bn2", w // 2, sd)
    sd["visual.conv3.weight"] = t(w, w // 2, 3, 3)
    bn("visual.bn3", w, sd)
    inp = w
    for s in range(4):
        planes = w * (2 ** s)
        L = f"visual.layer{s + 1}.0"
        sd[f"{L}.conv1.weight"] = t(planes, inp, 1, 1)
        bn(f"{L}.bn1", planes, sd)
        sd[f"{L}.conv2.weight"] = t(planes, planes, 3, 3)
        bn(f"{L}.bn2", planes, sd)
        sd[f"{L}.conv3.weight"] = t(planes * 4, planes, 1, 1)
        bn(f"{L}.bn3", planes * 4, sd)
        sd[f"{L}.downsample.0.weight"] = t(planes * 4, inp, 1, 1)
        bn(f"{L}.downsample.1", planes * 4, sd)
        inp = planes * 4
    C = w * 32
    sd["visual.attnpool.positional_embedding"] = t(2, C)  # 1x1 final grid
    for name in ("q_proj", "k_proj", "v_proj"):
        sd[f"visual.attnpool.{name}.weight"] = t(C, C)
        sd[f"visual.attnpool.{name}.bias"] = t(C)
    sd["visual.attnpool.c_proj.weight"] = t(embed, C)
    sd["visual.attnpool.c_proj.bias"] = t(embed)
    return sd


def test_load_openai_resnet_checkpoint(tmp_path):
    """RN-family checkpoints are detected and land on the ModifiedResNet
    tower (reference openai.py loads RN50/RN101 the same way as ViTs)."""
    import torch

    from instancediff_tpu.models.openai import load_openai_model

    sd = _tiny_openai_rn_sd()
    path = tmp_path / "tiny_rn.pt"
    torch.save(sd, str(path))
    model, _ = load_openai_model(str(path), tiny=True)
    emb_i = np.asarray(model.encode_image(np.zeros((1, 32, 32, 1), np.float32)))
    assert emb_i.shape == (1, 512) and np.isfinite(emb_i).all()
    got = np.asarray(
        model.visual_params["params"]["trunk"]["layer0_0"]["bn1"]["mean"])
    np.testing.assert_allclose(
        got, sd["visual.layer1.0.bn1.running_mean"].numpy(), atol=1e-6)
    emb_t = np.asarray(model.encode_text(["speckle in OCT"]))
    assert emb_t.shape == (1, 512) and np.isfinite(emb_t).all()
