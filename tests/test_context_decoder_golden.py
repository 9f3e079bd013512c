"""Golden parity: ContextDecoderRef vs the reference's executable torch code.

The reference's ``ContextDecoder`` family (_modified_BiomedCLIP.py:1194-1399)
and its ``TransformerDecoderLayer(_scaled)`` (:520-590) + ``Attention``
(:448-479) are plain torch.nn (no timm/flash imports on the non-flash path),
so this test re-states them verbatim in torch, runs a random-init eval
forward, converts the state dict with ``load_torch_context_decoder_weights``
and asserts the flax ``ContextDecoderRef`` output matches.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn_t = torch.nn

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from instancediff_tpu.models.vision_towers import (  # noqa: E402
    ContextDecoderRef,
    load_torch_context_decoder_weights,
)

WIDTH, HEADS, LAYERS, VIS, TXT, OUT = 16, 4, 2, 24, 20, 12


class TorchAttention(nn_t.Module):
    """_modified_BiomedCLIP.py:448-479 verbatim (qkv_bias=False default)."""

    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.q_proj = nn_t.Linear(dim, dim, bias=False)
        self.k_proj = nn_t.Linear(dim, dim, bias=False)
        self.v_proj = nn_t.Linear(dim, dim, bias=False)
        self.proj = nn_t.Linear(dim, dim)

    def forward(self, q, k, v):
        B, N, C = q.shape
        M = k.shape[1]
        q = self.q_proj(q).reshape(B, N, self.num_heads, C // self.num_heads)
        k = self.k_proj(k).reshape(B, M, self.num_heads, C // self.num_heads)
        v = self.v_proj(v).reshape(B, M, self.num_heads, C // self.num_heads)
        attn = torch.einsum("bnkc,bmkc->bknm", q, k) * self.scale
        attn = attn.softmax(dim=-1)
        x = torch.einsum("bknm,bmkc->bnkc", attn, v).reshape(B, N, C)
        return self.proj(x)


class TorchDecoderLayer(nn_t.Module):
    """:520-549 (plain) / :552-590 (scaled, gammas init 0.1)."""

    def __init__(self, d, h, scaled):
        super().__init__()
        self.self_attn = TorchAttention(d, h)
        self.cross_attn = TorchAttention(d, h)
        self.norm1 = nn_t.LayerNorm(d)
        self.norm2 = nn_t.LayerNorm(d)
        self.norm3 = nn_t.LayerNorm(d)
        self.mlp = nn_t.Sequential(
            nn_t.Linear(d, d * 4), nn_t.GELU(), nn_t.Dropout(0.0),
            nn_t.Linear(d * 4, d))
        self.scaled = scaled
        if scaled:
            self.gamma_sa = nn_t.Parameter(torch.ones((1, 1, d)) * 1e-1)
            self.gamma_ca = nn_t.Parameter(torch.ones((1, 1, d)) * 1e-1)
            self.gamma_mlp = nn_t.Parameter(torch.ones((1, 1, d)) * 1e-1)

    def forward(self, x, mem):
        g = (lambda n: getattr(self, n)) if self.scaled else (lambda n: 1.0)
        q = k = v = self.norm1(x)
        x = x + g("gamma_sa") * self.self_attn(q, k, v)
        q = self.norm2(x)
        x = x + g("gamma_ca") * self.cross_attn(q, mem, mem)
        x = x + g("gamma_mlp") * self.mlp(self.norm3(x))
        return x


class TorchContextDecoder(nn_t.Module):
    """:1194-1245 (plain) and the used scale-0 forward of the hierarchical
    variants (:1246-1399, scaled layers)."""

    def __init__(self, scaled, hier):
        super().__init__()
        mem = nn_t.Sequential(nn_t.LayerNorm(VIS), nn_t.Linear(VIS, WIDTH),
                              nn_t.LayerNorm(WIDTH))
        if hier:
            self.memory_proj_0 = mem
        else:
            self.memory_proj = mem
        self.text_proj = nn_t.Sequential(nn_t.LayerNorm(TXT),
                                         nn_t.Linear(TXT, WIDTH))
        self.decoder = nn_t.ModuleList(
            [TorchDecoderLayer(WIDTH, HEADS, scaled) for _ in range(LAYERS)])
        self.out_proj = nn_t.Sequential(nn_t.LayerNorm(WIDTH),
                                        nn_t.Linear(WIDTH, OUT))
        self.hier = hier

    def forward(self, text, visual):
        mem = (self.memory_proj_0 if self.hier else self.memory_proj)(visual)
        x = self.text_proj(text)
        for layer in self.decoder:
            x = layer(x, mem)
        return self.out_proj(x)


@pytest.mark.parametrize("scaled,hier", [(False, False), (True, True)])
def test_context_decoder_matches_torch(scaled, hier):
    torch.manual_seed(3 + scaled)
    tmodel = TorchContextDecoder(scaled, hier).eval()
    # randomise everything away from init (gammas included) so the test
    # can't pass on lucky constants
    with torch.no_grad():
        for p in tmodel.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    rng = np.random.default_rng(7)
    text = rng.standard_normal((2, 5, TXT)).astype(np.float32)
    vis = rng.standard_normal((2, 9, VIS)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(text), torch.from_numpy(vis)).numpy()

    fmodel = ContextDecoderRef(width=WIDTH, heads=HEADS, layers=LAYERS,
                               visual_dim=VIS, text_dim=TXT, out_dim=OUT,
                               scaled=scaled)
    params = jax.jit(fmodel.init)(jax.random.key(0), jnp.asarray(text),
                                  jnp.asarray(vis))["params"]
    params = load_torch_context_decoder_weights(
        params, tmodel.state_dict(), LAYERS)
    got = np.asarray(jax.jit(fmodel.apply)({"params": params},
                                           jnp.asarray(text),
                                           jnp.asarray(vis)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
