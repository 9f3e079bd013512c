"""Asserted quality gates (VERDICT r3 item 3): the repo's strongest results
previously lived in demos that PRINT; these tests make them FAIL on
regression.

One tiny engine is trained once per session (conftest.train_tiny_engine:
300 steps on synthetic OCT speckle, ~8 min on this 1-core box; the demo
tools/demo_restoration.py is the interactive twin), then:

- learning gate: full-grid restoration must beat the degraded input by
  >= +6 dB mean PSNR (measured headroom: +17 dB at 300 steps, so the gate is
  flake-proof while still catching a halved-quality regression);
- strided-parity gate: T/2-step strided sampling must stay within 0.7 dB
  mean PSNR of full-grid sampling — the mechanism behind the T=50 headline
  claim (PERF.md strided table; reference metric contract testUM.py:151-164);
- bf16 trained-parity gate: a bf16-compute twin trained identically must
  restore within 1.5 dB of the fp32-trained engine (the flagship
  measurement was +-0.2 dB across all 5 modalities, PERF.md; this catches a
  mixed-precision training regression — e.g. a stats-dtype slip — without
  a 2x60-epoch manual rerun, VERDICT r4 weak #5).

Measured at gate-creation (2026-08-19): restored [32.8, 33.3, 31.1, 33.5] vs
degraded [15.4, 16.1, 14.8, 16.1]; T=8 [32.2, 33.6, 32.4, 33.9].
"""

import jax
import numpy as np
import pytest

from instancediff_tpu.utils.metrics import eval_restoration

T_FULL = 16


def _mean_psnr(imgs, refs):
    return float(np.mean([
        eval_restoration(imgs[j, ..., 0], refs[j, ..., 0])["PSNR"]
        for j in range(imgs.shape[0])]))


def _restored_psnr(setup, **test_kw):
    eng, X0, MU, EMB, TY, batch = setup
    out = np.asarray(eng.test(batch, jax.random.key(7), use_ema=False,
                              **test_kw))
    return _mean_psnr(out, np.asarray(X0[:4]))


def test_learning_gate_restoration_beats_degraded_by_margin(tiny_trained_setup):
    eng, X0, MU, EMB, TY, batch = tiny_trained_setup
    restored = _restored_psnr(tiny_trained_setup)
    degraded = _mean_psnr(np.asarray(MU[:4]), np.asarray(X0[:4]))
    assert restored >= degraded + 6.0, (
        f"restoration regressed: restored {restored:.2f} dB vs degraded "
        f"{degraded:.2f} dB (demo-era headroom was ~+17 dB)")


def test_strided_parity_gate_half_steps_within_margin(tiny_trained_setup):
    eng, X0, MU, EMB, TY, batch = tiny_trained_setup
    p_full = _restored_psnr(tiny_trained_setup)
    p_half = _restored_psnr(tiny_trained_setup, sample_steps=T_FULL // 2)
    assert p_full - p_half <= 0.7, (
        f"strided sampling parity regressed: T={T_FULL} {p_full:.2f} dB vs "
        f"T={T_FULL // 2} {p_half:.2f} dB (measured delta at creation: "
        f"-0.31 dB, i.e. strided slightly better)")
    # and the strided path must itself restore (not just track a broken full)
    degraded = _mean_psnr(np.asarray(MU[:4]), np.asarray(X0[:4]))
    assert p_half >= degraded + 6.0


@pytest.mark.slow
def test_bf16_trained_parity_gate(tiny_trained_setup, tiny_trained_bf16_setup):
    """Mixed-precision TRAINING parity, asserted: the bf16-compute twin
    (same data/seed/steps, fp32 params+GN islands+loss) restores within
    1.5 dB of the fp32-trained engine and clears the learning gate itself.
    Flagship-scale evidence: +-0.2 dB on all 5 modalities (PERF.md
    'Trained-quality parity')."""
    eng, X0, MU, EMB, TY, batch = tiny_trained_setup
    p_fp32 = _restored_psnr(tiny_trained_setup)
    p_bf16 = _restored_psnr(tiny_trained_bf16_setup)
    degraded = _mean_psnr(np.asarray(MU[:4]), np.asarray(X0[:4]))
    assert p_bf16 >= degraded + 6.0, (
        f"bf16-trained engine failed the learning gate outright: "
        f"{p_bf16:.2f} dB vs degraded {degraded:.2f} dB")
    assert p_fp32 - p_bf16 <= 1.5, (
        f"bf16 trained-quality parity regressed: fp32 {p_fp32:.2f} dB vs "
        f"bf16 {p_bf16:.2f} dB (flagship-scale delta was within 0.2 dB)")
