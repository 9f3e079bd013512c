"""Asserted quality gates (VERDICT r3 item 3): the repo's strongest results
previously lived in demos that PRINT; these tests make them FAIL on
regression.

One tiny engine is trained once per module (300 steps on synthetic OCT
speckle, ~8 min on this 1-core box; the demo tools/demo_restoration.py is the
interactive twin), then:

- learning gate: full-grid restoration must beat the degraded input by
  >= +6 dB mean PSNR (measured headroom: +17 dB at 300 steps, so the gate is
  flake-proof while still catching a halved-quality regression);
- strided-parity gate: T/2-step strided sampling must stay within 0.7 dB
  mean PSNR of full-grid sampling — the mechanism behind the T=50 headline
  claim (PERF.md strided table; reference metric contract testUM.py:151-164).

Measured at gate-creation (2026-08-19): restored [32.8, 33.3, 31.1, 33.5] vs
degraded [15.4, 16.1, 14.8, 16.1]; T=8 [32.2, 33.6, 32.4, 33.9].
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancediff_tpu.data.synthetic import SyntheticMedDataset
from instancediff_tpu.models.drift_model import CLIPDriftEngine
from instancediff_tpu.sde import DriftSDE
from instancediff_tpu.utils.metrics import eval_restoration

N_TRAIN_STEPS = 300
T_FULL = 16


@pytest.fixture(scope="module")
def trained():
    ds = SyntheticMedDataset(n=16, res=32, artifact_types=["speckle in OCT"],
                             seed=0, emb_dim=16)
    items = [ds[i] for i in range(16)]
    X0 = jnp.stack([it["GT"] for it in items])
    MU = jnp.stack([it["LQ"] for it in items])
    TY = jnp.zeros((16,), jnp.int32)
    EMB = jnp.stack([it["A_emb"] for it in items])
    tiny = dict(in_nc=2, out_nc=5, nf=16, ch_mult=[1, 2], context_dim=16,
                text_module="scoremap", score_map_chan=4,
                if_MultiScoreMap=True, num_res_blocks=1)
    eng = CLIPDriftEngine(
        dnet_settings=tiny, nnet_settings=tiny, score_map_ch_mult=(1, 1),
        score_map_ngf=16, use_image_context=True, CLIP_Type="CLIP",
        tiny_text_encoder=True, sde=DriftSDE(T=T_FULL, max_sigma=0.3),
        image_size=32, nepoch=100, drift_net_lr=2e-3, noise_net_lr=2e-3,
        seed=0)
    for i in range(N_TRAIN_STEPS):
        idx = np.random.default_rng(i).choice(16, 8, replace=False)
        batch = {"input": MU[idx], "target": X0[idx], "type_idx": TY[idx],
                 "A_emb": EMB[idx]}
        eng.optimize_parameters(batch, jax.random.key(1000 + i),
                                epoch=i * 100 // N_TRAIN_STEPS)
    test_batch = {"input": MU[:4], "target": X0[:4], "type_idx": TY[:4],
                  "A_emb": EMB[:4]}
    return eng, np.asarray(X0[:4]), np.asarray(MU[:4]), test_batch


def _mean_psnr(imgs, refs):
    return float(np.mean([
        eval_restoration(imgs[j, ..., 0], refs[j, ..., 0])["PSNR"]
        for j in range(imgs.shape[0])]))


def test_learning_gate_restoration_beats_degraded_by_margin(trained):
    eng, X0, MU, batch = trained
    out = np.asarray(eng.test(batch, jax.random.key(7), use_ema=False))
    restored = _mean_psnr(out, X0)
    degraded = _mean_psnr(MU, X0)
    assert restored >= degraded + 6.0, (
        f"restoration regressed: restored {restored:.2f} dB vs degraded "
        f"{degraded:.2f} dB (demo-era headroom was ~+17 dB)")


def test_strided_parity_gate_half_steps_within_margin(trained):
    eng, X0, MU, batch = trained
    full = np.asarray(eng.test(batch, jax.random.key(7), use_ema=False))
    half = np.asarray(eng.test(batch, jax.random.key(7), use_ema=False,
                               sample_steps=T_FULL // 2))
    p_full = _mean_psnr(full, X0)
    p_half = _mean_psnr(half, X0)
    assert p_full - p_half <= 0.7, (
        f"strided sampling parity regressed: T={T_FULL} {p_full:.2f} dB vs "
        f"T={T_FULL // 2} {p_half:.2f} dB (measured delta at creation: "
        f"-0.31 dB, i.e. strided slightly better)")
    # and the strided path must itself restore (not just track a broken full)
    assert p_half >= _mean_psnr(MU, X0) + 6.0
