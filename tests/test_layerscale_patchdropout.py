"""LayerScale / PatchDropout tower options (VERDICT r3 item 6).

Golden vs the VENDORED open_clip ``VisionTransformer`` itself (reference
transformer.py:39-47 ``LayerScale``, :49-86 ``PatchDropout``, wired at
:203,214,382,512): a tower built with ``ls_init_value`` + ``patch_dropout``
round-trips its state dict through ``load_torch_clip_vision_weights`` and
matches end-to-end in eval mode (PatchDropout is train-only — identity in
eval on both sides). Train-mode PatchDropout is RNG-dependent, so its
contract (token count formula, cls retention, subset-of-input rows) is
property-tested against the vendored module's observable behavior.
"""

import importlib.machinery
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from instancediff_tpu.models.clip_vit import (  # noqa: E402
    OPENAI_MEAN,
    OPENAI_STD,
    CLIPVisionTower,
    load_torch_clip_vision_weights,
    patch_dropout_tokens,
)

RES, PATCH, WIDTH, HEADS, LAYERS, EMBED = 32, 8, 32, 4, 2, 24


@pytest.fixture(scope="module")
def vendored_transformer():
    # BiomedCLIP/__init__ pulls transform.py (torchvision) and tokenizer.py
    # (ftfy) — stub the missing deps like the other golden tests do
    if "torchvision.transforms" not in sys.modules:
        tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        fn = types.ModuleType("torchvision.transforms.functional")

        class _Interp:
            BICUBIC = "bicubic"
            BILINEAR = "bilinear"
            NEAREST = "nearest"

        for name in ("Normalize", "Compose", "RandomResizedCrop", "ToTensor",
                     "Resize", "CenterCrop", "ColorJitter", "Grayscale"):
            setattr(tr, name, type(name, (), {}))
        tr.InterpolationMode = _Interp
        tr.functional = fn
        tv.transforms = tr
        ops = types.ModuleType("torchvision.ops")
        misc = types.ModuleType("torchvision.ops.misc")
        misc.FrozenBatchNorm2d = torch.nn.Identity
        ops.misc = misc
        tv.ops = ops
        oc = types.ModuleType("open_clip")
        ocu = types.ModuleType("open_clip.utils")
        ocu.freeze_batch_norm_2d = lambda *a, **k: None
        oc.utils = ocu
        ftfy = types.ModuleType("ftfy")
        ftfy.fix_text = lambda s: s
        for name, mod in (("torchvision", tv), ("torchvision.transforms", tr),
                          ("torchvision.transforms.functional", fn),
                          ("torchvision.ops", ops), ("torchvision.ops.misc", misc),
                          ("open_clip", oc), ("open_clip.utils", ocu),
                          ("ftfy", ftfy)):
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
    sys.path.insert(0, "/root/reference/models/BiomedCLIP")
    import BiomedCLIP.transformer as rtf

    return rtf


def _preprocessed(img_pm1):
    x01 = (img_pm1 + 1.0) / 2.0
    x01 = np.repeat(x01, 3, axis=-1)
    x = (x01 - np.asarray(OPENAI_MEAN)) / np.asarray(OPENAI_STD)
    return torch.from_numpy(x.transpose(0, 3, 1, 2).astype(np.float32))


def test_layerscale_tower_golden_roundtrip(vendored_transformer):
    rtf = vendored_transformer
    torch.manual_seed(33)
    net = rtf.VisionTransformer(
        image_size=RES, patch_size=PATCH, width=WIDTH, layers=LAYERS,
        heads=HEADS, mlp_ratio=4.0, ls_init_value=0.1, output_dim=EMBED,
        patch_dropout=0.5,  # identity in eval mode on both sides
        act_layer=rtf.QuickGELU).eval()
    with torch.no_grad():  # move gammas off their constant init
        for n, p in net.named_parameters():
            if "ls_" in n:
                p.add_(torch.randn_like(p) * 0.02)

    rng = np.random.default_rng(12)
    img = rng.uniform(-1, 1, (2, RES, RES, 1)).astype(np.float32)
    with torch.no_grad():
        want = net(_preprocessed(img)).numpy()

    sd = {f"visual.{k}": v for k, v in net.state_dict().items()}
    assert any(".ls_1.gamma" in k for k in sd), "ls params missing upstream?"
    tower = CLIPVisionTower(image_size=RES, patch_size=PATCH, width=WIDTH,
                            layers=LAYERS, heads=HEADS, embed_dim=EMBED,
                            act="quick_gelu", ln_eps=1e-5, use_ln_pre=True,
                            ls_init=0.1, patch_dropout=0.5)
    params = jax.jit(tower.init)(jax.random.key(0), jnp.asarray(img))
    params = load_torch_clip_vision_weights(params, sd)
    got = np.asarray(jax.jit(tower.apply)(params, jnp.asarray(img)))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)


def test_layerscale_timm_naming_converts():
    """timm checkpoints name the gammas ls1/ls2 (no underscore)."""
    tower = CLIPVisionTower(image_size=RES, patch_size=PATCH, width=WIDTH,
                            layers=1, heads=HEADS, embed_dim=EMBED,
                            act="gelu", ln_eps=1e-6, ls_init=1e-5)
    img = np.zeros((1, RES, RES, 1), np.float32)
    params = jax.jit(tower.init)(jax.random.key(0), jnp.asarray(img))
    g1 = torch.full((WIDTH,), 0.25)
    g2 = torch.full((WIDTH,), 0.75)
    sd = {"visual.trunk.blocks.0.ls1.gamma": g1,
          "visual.trunk.blocks.0.ls2.gamma": g2,
          # minimal timm-block presence so the loop enters
          "visual.trunk.blocks.0.attn.qkv.weight": torch.zeros(3 * WIDTH, WIDTH),
          "visual.trunk.blocks.0.attn.qkv.bias": torch.zeros(3 * WIDTH),
          "visual.trunk.blocks.0.attn.proj.weight": torch.zeros(WIDTH, WIDTH),
          "visual.trunk.blocks.0.attn.proj.bias": torch.zeros(WIDTH),
          "visual.trunk.blocks.0.mlp.fc1.weight": torch.zeros(4 * WIDTH, WIDTH),
          "visual.trunk.blocks.0.mlp.fc1.bias": torch.zeros(4 * WIDTH),
          "visual.trunk.blocks.0.mlp.fc2.weight": torch.zeros(WIDTH, 4 * WIDTH),
          "visual.trunk.blocks.0.mlp.fc2.bias": torch.zeros(WIDTH)}
    params = load_torch_clip_vision_weights(params, sd)
    np.testing.assert_allclose(params["params"]["block_0"]["ls_1"], 0.25)
    np.testing.assert_allclose(params["params"]["block_0"]["ls_2"], 0.75)


def test_ls_default_off_keeps_param_tree():
    """ls_init=None (the shipped BiomedCLIP setting) must add no params."""
    tower = CLIPVisionTower(image_size=RES, patch_size=PATCH, width=WIDTH,
                            layers=1, heads=HEADS, embed_dim=EMBED)
    img = np.zeros((1, RES, RES, 1), np.float32)
    params = jax.jit(tower.init)(jax.random.key(0), jnp.asarray(img))
    assert "ls_1" not in params["params"]["block_0"]


@pytest.mark.parametrize("n_tok,prob", [(16, 0.5), (17, 0.3), (5, 0.9)])
def test_patch_dropout_matches_vendored_contract(vendored_transformer, n_tok, prob):
    rtf = vendored_transformer
    x = np.random.default_rng(0).normal(size=(3, n_tok + 1, 8)).astype(np.float32)

    ref = rtf.PatchDropout(prob).train()
    out_ref = ref(torch.from_numpy(x))
    out = patch_dropout_tokens(jax.random.key(1), jnp.asarray(x), prob)
    # identical kept-token count (the max(1, int(N*keep)) formula)
    assert out.shape == tuple(out_ref.shape)
    # cls token always survives in slot 0
    np.testing.assert_array_equal(np.asarray(out[:, 0]), x[:, 0])
    # every kept row is one of the input patch rows of the SAME sample
    for b in range(x.shape[0]):
        rows = {tuple(r) for r in x[b, 1:]}
        for r in np.asarray(out[b, 1:]):
            assert tuple(r) in rows
    # eval mode / prob=0 are identity
    np.testing.assert_array_equal(
        np.asarray(patch_dropout_tokens(jax.random.key(1), jnp.asarray(x), 0.0)), x)
    np.testing.assert_array_equal(ref.eval()(torch.from_numpy(x)).numpy(), x)


def test_patch_dropout_tower_train_vs_eval():
    tower = CLIPVisionTower(image_size=RES, patch_size=PATCH, width=WIDTH,
                            layers=1, heads=HEADS, embed_dim=EMBED,
                            patch_dropout=0.75)
    img = np.random.default_rng(5).uniform(-1, 1, (2, RES, RES, 1)).astype(np.float32)
    params = jax.jit(tower.init)(jax.random.key(0), jnp.asarray(img))
    ev = tower.apply(params, jnp.asarray(img))  # deterministic default: identity
    tr1 = tower.apply(params, jnp.asarray(img), deterministic=False,
                      rngs={"patch_dropout": jax.random.key(1)})
    tr2 = tower.apply(params, jnp.asarray(img), deterministic=False,
                      rngs={"patch_dropout": jax.random.key(2)})
    assert not np.allclose(ev, tr1)   # dropout active in train mode
    assert not np.allclose(tr1, tr2)  # and rng-dependent
