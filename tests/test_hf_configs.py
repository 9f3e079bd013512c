"""HF arch-registry breadth (VERDICT r3 'missing' item 4).

- the registry's field-name dispatch is golden vs the reference's own
  ``hf_configs.py`` (a pure-dict module, imported directly by file path);
- config addressing resolves real transformers configs (RobertaConfig);
- the roberta-family flax tower (position offset 2, ln_eps 1e-5, single
  token-type row, mean pooler) is GOLDEN vs a random-init transformers
  ``RobertaModel`` + the open_clip MLP projection head, converted through
  ``load_torch_bert_weights`` (HF naming is shared across the BERT family);
- non-BERT-family archs (mt5) resolve their dims but raise clearly at tower
  build, matching the scope note in hf_configs.py.
"""

import importlib.util

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from instancediff_tpu.models.hf_configs import (  # noqa: E402
    ARCH_DICT,
    build_hf_text_tower,
    resolve_hf_text_cfg,
)
from instancediff_tpu.models.text_encoder import load_torch_bert_weights  # noqa: E402

REF_HF_CONFIGS = "/root/reference/models/BiomedCLIP/BiomedCLIP/hf_configs.py"


def _ref_arch_dict():
    spec = importlib.util.spec_from_file_location("ref_hf_configs", REF_HF_CONFIGS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.arch_dict


def test_registry_matches_reference_field_names():
    ref = _ref_arch_dict()
    assert set(ARCH_DICT) == set(ref)
    for arch, spec in ref.items():
        assert ARCH_DICT[arch]["pooler"] == spec["pooler"], arch
        ours = ARCH_DICT[arch]["config_names"]
        for field, name in spec["config_names"].items():
            assert ours[field] == name, (arch, field)


def test_resolve_from_transformers_configs():
    cfg = transformers.RobertaConfig(
        vocab_size=99, hidden_size=32, num_attention_heads=4,
        num_hidden_layers=2, max_position_embeddings=40)
    r = resolve_hf_text_cfg(cfg)
    assert r["width"] == 32 and r["heads"] == 4 and r["layers"] == 2
    assert r["context_length"] == 40 and r["vocab_size"] == 99
    assert r["pooler"] == "mean_pooler" and r["position_offset"] == 2
    # mt5: unlimited seqlen -> context_length None
    m = resolve_hf_text_cfg({"model_type": "mt5", "vocab_size": 50,
                             "d_model": 16, "num_heads": 2, "num_layers": 1})
    assert m["context_length"] is None and m["width"] == 16
    with pytest.raises(KeyError):
        resolve_hf_text_cfg({"model_type": "gpt-neo"})


def test_non_bert_family_raises_at_build():
    with pytest.raises(NotImplementedError, match="mt5"):
        build_hf_text_tower({"model_type": "mt5", "vocab_size": 50,
                             "d_model": 16, "num_heads": 2, "num_layers": 1})


def test_roberta_tower_golden_vs_transformers():
    torch.manual_seed(51)
    hidden, heads, layers, vocab, maxpos, proj_dim = 32, 4, 2, 99, 40, 24
    cfg = transformers.RobertaConfig(
        vocab_size=vocab, hidden_size=hidden, num_attention_heads=heads,
        num_hidden_layers=layers, intermediate_size=4 * hidden,
        max_position_embeddings=maxpos, layer_norm_eps=1e-5,
        hidden_act="gelu", attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0, pad_token_id=1)
    net = transformers.RobertaModel(cfg, add_pooling_layer=False).eval()

    L, K = 9, 3
    rng = np.random.default_rng(4)
    ids = rng.integers(2, vocab, (K, L))  # avoid pad id 1
    mask = np.ones((K, L), np.int64)
    with torch.no_grad():
        hs = net(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask)).last_hidden_state
        pooled = hs.mean(1)  # mean_pooler with full mask
        w1 = torch.randn((hidden + proj_dim) // 2, hidden) * 0.05
        w2 = torch.randn(proj_dim, (hidden + proj_dim) // 2) * 0.05
        want = (torch.nn.functional.gelu(pooled @ w1.T) @ w2.T).numpy()

    tower, rcfg = build_hf_text_tower(cfg, proj_dim=proj_dim)
    assert rcfg["pooler"] == "mean_pooler"
    assert tower.position_offset == 2 and tower.ln_eps == 1e-5
    params = jax.jit(tower.init)(jax.random.key(0), jnp.asarray(ids),
                                 jnp.asarray(mask))
    sd = {"transformer." + k: v for k, v in net.state_dict().items()}
    sd["proj.0.weight"] = w1
    sd["proj.2.weight"] = w2
    params = load_torch_bert_weights(params, sd, prefix="")
    got = np.asarray(tower.apply(params, jnp.asarray(ids), jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
