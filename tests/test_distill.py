"""Progressive few-step distillation (models/distill.py): exact target
algebra + grid nesting (fast) and an asserted tiny-scale quality gate
(slow) — the training-side instrument behind the fast-sampler headline
(VERDICT r4 item 2; reference metric contract testUM.py:151-164)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancediff_tpu.models.distill import (build_distill_step, distill_grid,
                                             distill_phase)
from instancediff_tpu.sde import DriftSDE
from instancediff_tpu.utils.metrics import eval_restoration


def test_distill_grid_nests_and_orders():
    from instancediff_tpu.sde.schedules import strided_sampling_grid

    for T, N in [(100, 50), (100, 25), (16, 8), (16, 4), (16, 2)]:
        th, tm, tl = distill_grid(T, N)
        assert th.shape == tm.shape == tl.shape == (N,)
        assert int(th[-1]) == T and int(tl[0]) == 0
        assert bool(jnp.all(th > tm)) and bool(jnp.all(tm > tl))
        # student pairs ARE the sampler's strided grid: a distilled model is
        # queried at exactly its training pairs by test(sample_steps=N)
        s_hi, s_lo = strided_sampling_grid(T, N)
        np.testing.assert_array_equal(np.asarray(th), np.asarray(s_hi)[::-1])
        np.testing.assert_array_equal(np.asarray(tl), np.asarray(s_lo)[::-1])


def test_distill_grid_rejects_too_fine_student():
    with pytest.raises(ValueError):
        distill_grid(16, 12)  # teacher grid would need 2N=24 > T points


def test_two_teacher_steps_compose_exactly_into_one():
    """The increment-weighted targets reproduce the teacher's two-step
    deterministic endpoint bit-for-bit — the property that makes the distill
    loss a regression on an EXACT one-step equivalent (models/distill.py
    module docstring; sde/drift_sde.py:reverse_step linearity)."""
    sde = DriftSDE(T=100, max_sigma=0.4)
    B = 3
    x_t = jax.random.normal(jax.random.key(1), (B, 8, 8, 1))
    pd1, pn1, pd2, pn2 = [jax.random.normal(jax.random.key(10 + i), x_t.shape)
                          for i in range(4)]
    th = jnp.array([100, 62, 4])
    tm = jnp.array([99, 61, 2])
    tl = jnp.array([98, 60, 0])
    z = jnp.zeros_like(x_t)
    x_mid = sde.reverse_step(None, x_t, th, pd1, pn1, eta=0.0, t_prev=tm, z=z)
    x_lo = sde.reverse_step(None, x_mid, tm, pd2, pn2, eta=0.0, t_prev=tl, z=z)

    bshape = (B, 1, 1, 1)
    sd = lambda t: sde.drift_schedule[t].reshape(bshape)  # noqa: E731
    sg = lambda t: sde.sigmas[t].reshape(bshape)  # noqa: E731
    dsd1, dsd2 = sd(th) - sd(tm), sd(tm) - sd(tl)
    dsg1, dsg2 = sg(th) - sg(tm), sg(tm) - sg(tl)
    d_tgt = (dsd1 * pd1 + dsd2 * pd2) / jnp.maximum(dsd1 + dsd2, 1e-8)
    n_tgt = (dsg1 * pn1 + dsg2 * pn2) / jnp.maximum(dsg1 + dsg2, 1e-8)
    x_lo_1step = sde.reverse_step(None, x_t, th, d_tgt, n_tgt, eta=0.0,
                                  t_prev=tl, z=z)
    np.testing.assert_allclose(np.asarray(x_lo_1step), np.asarray(x_lo),
                               atol=2e-6, rtol=2e-6)


@pytest.mark.parametrize("teacher_eta", [1.0, 0.7])
def test_stochastic_teacher_composes_into_conditional_mean(teacher_eta):
    """General-eta composition (build_distill_step teacher_eta): the
    student's DETERMINISTIC one-step with the increment-weighted targets
    (including the -c1*z1 correction) equals the z1-conditioned mean of the
    teacher's two stochastic steps (= the rollout with the second step's
    fresh draw z2 zeroed, since z2 enters additively)."""
    sde = DriftSDE(T=100, max_sigma=0.4)
    B = 3
    key = jax.random.key(5)
    x_t = jax.random.normal(key, (B, 8, 8, 1))
    pd1, pn1, pd2, pn2, z1 = [
        jax.random.normal(jax.random.key(20 + i), x_t.shape)
        for i in range(5)]
    th = jnp.array([100, 62, 8])
    tm = jnp.array([98, 60, 4])
    tl = jnp.array([96, 58, 0])
    zeros = jnp.zeros_like(x_t)

    # teacher: stochastic first step (draw z1), second step at its mean
    x_mid = sde.reverse_step(None, x_t, th, pd1, pn1, eta=teacher_eta,
                             t_prev=tm, z=z1)
    x_lo_mean = sde.reverse_step(None, x_mid, tm, pd2, pn2, eta=teacher_eta,
                                 t_prev=tl, z=zeros)

    bshape = (B, 1, 1, 1)
    sd = lambda t: sde.drift_schedule[t].reshape(bshape)  # noqa: E731
    sg = lambda t: sde.sigmas[t].reshape(bshape)  # noqa: E731
    carry1, c1 = sde.posterior_coeffs(sg(th), sg(tm), teacher_eta)
    carry2, _ = sde.posterior_coeffs(sg(tm), sg(tl), teacher_eta)
    dsd1, dsd2 = sd(th) - sd(tm), sd(tm) - sd(tl)
    d_tgt = (dsd1 * pd1 + dsd2 * pd2) / jnp.maximum(dsd1 + dsd2, 1e-8)
    n_tgt = ((sg(th) - carry1) * pn1 + (sg(tm) - carry2) * pn2
             - c1 * z1) / jnp.maximum(sg(th) - sg(tl), 1e-8)

    x_lo_1step = sde.reverse_step(None, x_t, th, d_tgt, n_tgt, eta=0.0,
                                  t_prev=tl, z=zeros)
    np.testing.assert_allclose(np.asarray(x_lo_1step), np.asarray(x_lo_mean),
                               atol=2e-6, rtol=2e-6)


def test_distill_step_runs_and_self_distill_loss_is_small(tiny_trained_setup):
    """One jitted distill step from the trained engine's own weights as
    teacher: metrics finite, and the self-distillation loss is small (only
    the teacher's own two-step vs one-step prediction inconsistency), far
    below the from-scratch training loss ~1.0."""
    eng, X0, MU, EMB, TY, batch4 = tiny_trained_setup
    state = jax.tree.map(jnp.copy, eng.state)
    teacher = {"drift": state["drift"], "noise": state["noise"]}
    step = jax.jit(build_distill_step(eng, 8))
    new_state, metrics = step(
        state, batch4, jax.random.key(0), teacher, eng.text_params,
        jnp.asarray(1e-3, jnp.float32), jnp.asarray(1e-3, jnp.float32))
    for v in metrics.values():
        assert np.isfinite(float(v))
    assert float(metrics["l"]) < 0.5
    assert int(new_state["step"]) == int(eng.state["step"]) + 1


@pytest.mark.slow
def test_distilled_half_steps_match_teacher_quality(tiny_trained_setup):
    """THE distillation gate: one halving phase (T=16 teacher -> T=8
    student, 150 steps) must keep deterministic T=8 sampling within 1.0 dB
    of the teacher's full-grid result and clear the learning gate.

    Measured at gate creation: distilled T=8 eta=0 33.66 dB vs teacher
    T=16 eta=1 32.88 dB (distilled BETTER by +0.8 dB at tiny scale; at
    flagship scale the win is holding T<=50 AT the T=100 level, PERF.md).
    The engine state is snapshotted and restored so the shared fixture
    stays pristine for other tests."""
    eng, X0, MU, EMB, TY, batch4 = tiny_trained_setup
    X0n, MUn = np.asarray(X0[:4]), np.asarray(MU[:4])

    def mean_psnr(imgs, refs):
        return float(np.mean([
            eval_restoration(imgs[j, ..., 0], refs[j, ..., 0])["PSNR"]
            for j in range(imgs.shape[0])]))

    p_teacher = mean_psnr(
        np.asarray(eng.test(batch4, jax.random.key(7), use_ema=False)), X0n)

    saved_state = jax.tree.map(jnp.copy, eng.state)
    saved_cache = (eng._sample_fn, eng._sample_steps, eng._train_step)
    try:
        def batches():
            i = 0
            while True:
                idx = np.random.default_rng(50_000 + i).choice(16, 8,
                                                               replace=False)
                yield {"input": MU[idx], "target": X0[idx],
                       "type_idx": TY[idx], "A_emb": EMB[idx]}
                i += 1

        distill_phase(eng, 8, batches(), 150, jax.random.key(77), lr=1e-3,
                      ema_as_teacher=False, log_every=0)
        p_distilled = mean_psnr(
            np.asarray(eng.test(batch4, jax.random.key(7), use_ema=False,
                                sample_steps=8, eta=0.0)), X0n)
    finally:
        eng.state = saved_state
        eng._sample_fn, eng._sample_steps, eng._train_step = saved_cache

    degraded = mean_psnr(MUn, X0n)
    assert p_distilled >= degraded + 6.0, (
        f"distilled sampler lost the restoration itself: {p_distilled:.2f} "
        f"dB vs degraded {degraded:.2f} dB")
    assert p_teacher - p_distilled <= 1.0, (
        f"distillation gate regressed: teacher T=16 {p_teacher:.2f} dB vs "
        f"distilled T=8 {p_distilled:.2f} dB (at creation the distilled "
        f"student was BETTER by 0.8 dB)")


@pytest.mark.slow
def test_stochastic_teacher_distill_gate(tiny_trained_setup):
    """Stochastic-teacher (teacher_eta=1) halving phase: the student's
    deterministic T=8 sampler must stay within 1.0 dB of the teacher's
    full-grid eta=1 result and clear the learning gate. This is the code
    path behind the flagship headline — at flagship scale the mean-student
    BEAT the T=100 eta=1 teacher by +1.26 dB mean PSNR (PERF.md round 5);
    tiny scale only regression-guards the path end-to-end (the eta=0
    trajectory gap it fixes does not manifest at T=16/0.4sigma)."""
    eng, X0, MU, EMB, TY, batch4 = tiny_trained_setup
    X0n, MUn = np.asarray(X0[:4]), np.asarray(MU[:4])

    def mean_psnr(imgs, refs):
        return float(np.mean([
            eval_restoration(imgs[j, ..., 0], refs[j, ..., 0])["PSNR"]
            for j in range(imgs.shape[0])]))

    p_teacher = mean_psnr(
        np.asarray(eng.test(batch4, jax.random.key(7), use_ema=False)), X0n)

    saved_state = jax.tree.map(jnp.copy, eng.state)
    saved_cache = (eng._sample_fn, eng._sample_steps, eng._train_step)
    try:
        def batches():
            i = 0
            while True:
                idx = np.random.default_rng(70_000 + i).choice(16, 8,
                                                               replace=False)
                yield {"input": MU[idx], "target": X0[idx],
                       "type_idx": TY[idx], "A_emb": EMB[idx]}
                i += 1

        distill_phase(eng, 8, batches(), 150, jax.random.key(78), lr=1e-3,
                      ema_as_teacher=False, teacher_eta=1.0, log_every=0)
        p_distilled = mean_psnr(
            np.asarray(eng.test(batch4, jax.random.key(7), use_ema=False,
                                sample_steps=8, eta=0.0)), X0n)
    finally:
        eng.state = saved_state
        eng._sample_fn, eng._sample_steps, eng._train_step = saved_cache

    degraded = mean_psnr(MUn, X0n)
    assert p_distilled >= degraded + 6.0, (
        f"stochastic-teacher student lost the restoration: "
        f"{p_distilled:.2f} dB vs degraded {degraded:.2f} dB")
    assert p_teacher - p_distilled <= 1.0, (
        f"stochastic-teacher gate regressed: teacher T=16 eta=1 "
        f"{p_teacher:.2f} dB vs mean-student T=8 eta=0 {p_distilled:.2f} dB")
