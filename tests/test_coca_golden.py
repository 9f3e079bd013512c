"""Golden parity: models/coca.py vs the VENDORED open_clip CoCa itself.

The reference's ``coca_model.py`` is executable (its only missing dependency
chain is torchvision inside transform.py, stubbed here), so this golden
imports the real vendored class, builds a tiny CoCa, converts its state dict
through ``load_torch_coca_weights`` and asserts the full forward dict —
image latent, attentional-pool tokens, text latent, decoder logits —
matches the flax model end-to-end."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from instancediff_tpu.models.clip_vit import OPENAI_MEAN, OPENAI_STD  # noqa: E402
from instancediff_tpu.models.coca import build_coca, load_torch_coca_weights  # noqa: E402


@pytest.fixture(scope="module")
def vendored_coca_module():
    # another golden test may have stubbed the torchvision root already
    # (with different submodules) — augment, never skip
    if "torchvision.transforms" not in sys.modules:
        tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        fn = types.ModuleType("torchvision.transforms.functional")

        class _Interp:  # evaluated at import for default args
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
        misc.FrozenBatchNorm2d = torch.nn.Identity  # dead on our import path
        ops.misc = misc
        tv.ops = ops
        import importlib.machinery

        oc = types.ModuleType("open_clip")  # modified_resnet.py imports it
        ocu = types.ModuleType("open_clip.utils")
        ocu.freeze_batch_norm_2d = lambda *a, **k: None
        oc.utils = ocu
        ftfy = types.ModuleType("ftfy")  # tokenizer.py text cleanup dep
        ftfy.fix_text = lambda s: s
        for name, mod in (("torchvision", tv),
                          ("torchvision.transforms", tr),
                          ("torchvision.transforms.functional", fn),
                          ("torchvision.ops", ops),
                          ("torchvision.ops.misc", misc),
                          ("open_clip", oc),
                          ("open_clip.utils", ocu),
                          ("ftfy", ftfy)):
            mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
            sys.modules[name] = mod
    sys.path.insert(0, "/root/reference/models/BiomedCLIP")
    import BiomedCLIP.coca_model as cm

    return cm


EMBED, VOCAB, CTX, WIDTH, HEADS, LAYERS = 16, 64, 12, 16, 2, 2
RES, PATCH, NQ = 16, 8, 5


def test_coca_matches_vendored_open_clip(vendored_coca_module):
    cm = vendored_coca_module
    torch.manual_seed(41)
    tmodel = cm.CoCa(
        embed_dim=EMBED,
        multimodal_cfg=dict(context_length=CTX, vocab_size=VOCAB, width=WIDTH,
                            heads=HEADS, layers=LAYERS),
        text_cfg=dict(context_length=CTX, vocab_size=VOCAB, width=WIDTH,
                      heads=HEADS, layers=LAYERS, embed_cls=True,
                      output_tokens=True),
        vision_cfg=dict(image_size=RES, patch_size=PATCH, width=WIDTH,
                        layers=LAYERS, head_width=WIDTH // HEADS,
                        attentional_pool=True, attn_pooler_queries=NQ,
                        attn_pooler_heads=8, output_tokens=True),
    ).eval()
    # randomize away from init so zero-initialised layers can't fake a match;
    # MultimodalTransformer never calls its init_parameters, leaving
    # text_projection as torch.empty garbage (~1e35) — re-init it sanely
    with torch.no_grad():
        for p in tmodel.parameters():
            p.add_(torch.randn_like(p) * 0.02)
        tmodel.text_decoder.text_projection.normal_(0, 0.05)

    rng = np.random.default_rng(14)
    img_pm1 = rng.uniform(-1, 1, (2, RES, RES, 1)).astype(np.float32)
    x01 = np.repeat((img_pm1 + 1.0) / 2.0, 3, axis=-1)
    xin = ((x01 - np.asarray(OPENAI_MEAN)) / np.asarray(OPENAI_STD))
    ids = rng.integers(1, VOCAB, (2, CTX), dtype=np.int64)
    ids[0, -3:] = 0  # pad tail: exercises the cls/pad key mask

    with torch.no_grad():
        timg = torch.from_numpy(xin.transpose(0, 3, 1, 2).astype(np.float32))
        want_img = tmodel(timg)  # no-text call returns image_embs too
        want = tmodel(timg, torch.from_numpy(ids))

    fmodel = build_coca(tiny=True)
    params = jax.jit(fmodel.init)(
        jax.random.key(0), jnp.asarray(img_pm1),
        jnp.asarray(ids.astype(np.int32)))
    params = load_torch_coca_weights(params, tmodel.state_dict())
    got = jax.jit(fmodel.apply)(params, jnp.asarray(img_pm1),
                                jnp.asarray(ids.astype(np.int32)))

    np.testing.assert_allclose(np.asarray(got["image_features"]),
                               want["image_features"].numpy(),
                               atol=3e-5, rtol=1e-4)
    got_img = jax.jit(fmodel.apply)(params, jnp.asarray(img_pm1))
    np.testing.assert_allclose(np.asarray(got_img["image_embs"]),
                               want_img["image_embs"].numpy(),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got["text_features"]),
                               want["text_features"].numpy(),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got["logits"]),
                               want["logits"].numpy(), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(float(got["logit_scale"]),
                               float(want["logit_scale"]), rtol=1e-5)
