"""Progressive few-step distillation of the dual-net drift sampler.

The graph-side perf levers are measured-exhausted at ~2.95 img/s for the
exact T=100 sampler on one v5e chip (PERF.md round-4 conclusion); the
remaining lever on the speed/quality frontier is the TRAINING side: teach a
student to take ONE deterministic ancestral step where the teacher takes two
(progressive distillation, Salimans & Ho 2022), halving the sampler's step
count per phase at (near-)zero quality cost — T=100 -> 50 -> 25 gives ~4x
throughput on the step-dominated scan.

Why this SDE makes the targets cheap and EXACT: the deterministic (eta=0)
reverse step (sde/drift_sde.py:reverse_step) is linear in the two network
predictions,

    x_{t'} = x_t - (s_d[t]-s_d[t'])*D_hat - (sigma_t-sigma_{t'})*eps_hat,

so a two-step teacher rollout t -> t_mid -> t_lo composes into one step whose
effective predictions are the increment-weighted averages

    D*   = [(s_d[t]-s_d[m])*D_1 + (s_d[m]-s_d[l])*D_2] / (s_d[t]-s_d[l])
    eps* = [(sig_t-sig_m)*e_1 + (sig_m-sig_l)*e_2]     / (sig_t-sig_l).

A student predicting exactly (D*, eps*) at t reproduces the teacher's
two-step endpoint bit-for-bit — no endpoint/x0 trade-off, no 2x2 solve.
The student regresses on these targets (plus the usual score-map pyramids
against the same targets, keeping the SMM heads in-distribution), starting
from the teacher's weights.

Timestep grids nest exactly: ``distill_grid(T, N)`` asserts that the
student's ``strided_sampling_grid(T, N)`` equals every second point of the
teacher's 2N-grid, so a phase-k student is only ever queried at pairs it was
trained on when it becomes the phase-(k+1) teacher.

Sampling a distilled model: ``engine.test(..., sample_steps=N, eta=0.0)`` —
the targets are tuned for the deterministic sampler (the reference's
commented ``reverse_ode`` alternative, drift_noise_model.py:651).

Reference parity note: the upstream repo has no distillation subsystem (its
sampler is a fixed T=100 Python loop, drift_noise_model.py:650); this module
is additive TPU-side capability toward BASELINE.json's >=10x north star.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.resize import downsample_label
from .drift_model import CLIPDriftEngine, _ema_update, cosine_annealing_lr


def distill_grid(T: int, student_steps: int):
    """(t_hi, t_mid, t_lo) int32 arrays of length ``student_steps``.

    Student pairs (t_hi, t_lo) are exactly ``strided_sampling_grid(T, N)``'s
    pairs; t_mid is the teacher's 2N-grid point between them. Raises if the
    grids do not nest (they do for the supported N: any N with 2N <= T where
    rounding collisions don't occur — in particular T=100 with N in {50,25}
    and all power-of-two subdivisions of a power-of-two T)."""
    from ..sde.schedules import strided_sampling_grid

    N = int(student_steps)
    if 2 * N > T:
        raise ValueError(f"teacher grid needs 2*{N} <= T={T}")
    g2 = np.unique(np.round(np.linspace(0, T, 2 * N + 1)).astype(np.int64))
    if len(g2) != 2 * N + 1:
        raise ValueError(f"teacher grid for N={N} collides at T={T}")
    s_hi, s_lo = strided_sampling_grid(T, N)
    gs = np.asarray(jnp.concatenate([s_lo[::-1][:1], s_hi[::-1]]))
    if not np.array_equal(np.asarray(g2[::2]), gs):
        raise ValueError(
            f"student grid (N={N}) is not nested in the teacher 2N-grid at "
            f"T={T}; pick N so round(linspace) points coincide")
    t_lo = jnp.asarray(g2[0:-2:2], jnp.int32)
    t_mid = jnp.asarray(g2[1:-1:2], jnp.int32)
    t_hi = jnp.asarray(g2[2::2], jnp.int32)
    return t_hi, t_mid, t_lo


def build_distill_step(eng: CLIPDriftEngine, student_steps: int,
                       axis_name: Optional[str] = None,
                       teacher_eta: float = 0.0,
                       z1_correction: bool = False):
    """Jittable distill step:
    ``step(state, batch, key, teacher, text_params, lr_d, lr_n)
      -> (state, metrics)``
    where ``teacher = {'drift': dparams, 'noise': nparams}`` is frozen.

    Mirrors ``build_train_step`` (same optimizers, EMA, metric keys) with the
    forward-diffusion targets replaced by the two-step teacher composition.

    ``teacher_eta`` selects which teacher CHAIN is being distilled. 0 (the
    default) composes two deterministic steps exactly (module docstring).
    eta>0 rolls the teacher's first sub-step stochastically (fresh draw z1,
    DDPM posterior split from ``sde.posterior_coeffs``) and regresses the
    student's deterministic step onto the z1-conditioned mean of the
    two-step endpoint (the z2 fresh noise of the second sub-step is
    zero-mean and drops out of the target):

        (sig_t - sig_l) * eps*  =  (sig_t - carry1)*e_1
                                  + (sig_m - carry2)*e_2  [-  c1*z1].

    Averaged over z1 draws by the regression, the student learns the
    CONDITIONAL MEAN of the stochastic teacher chain — the L2/PSNR-optimal
    readout of the DDPM sampler. The bracketed exact-composition term is
    zero-mean across z1 draws, so ``z1_correction=False`` (default) is an
    unbiased estimator of the same mean with far lower gradient variance:
    c1/(sig_t - sig_l) reaches ~6 at mid-schedule for the N=50 phase, and
    for a well-trained teacher e_2 contains the matching +c1*z1/sig_m noise
    content, leaving the corrected target's z1 variance ~c1^2 anyway
    (tests/test_distill.py asserts the exact bracketed algebra;
    the uncorrected target is the Rao-Blackwellised practical choice). This is the flagship-scale fix for the
    measured ~4.5 dB deterministic-chain gap (PERF.md round 5): at eta=0 the
    composed targets faithfully reproduce a trajectory whose carried
    eps-prediction errors never get re-randomised, so the student inherits
    the eta=0 ceiling; distilling the eta=1 chain's mean does not.
    """
    if eng.optimize_type not in ("inputRes", "predict_noise", ""):
        raise ValueError(
            "distillation is implemented for the reference's live 'inputRes' "
            f"contract only (got optimize_type={eng.optimize_type!r})")
    sde = eng.sde
    t_hi, t_mid, t_lo = distill_grid(sde.T, student_steps)
    n_pairs = int(t_hi.shape[0])

    def sm_loss(sms, label):
        terms = [jnp.mean((sm - downsample_label(label, 2 ** i)) ** 2)
                 for i, sm in enumerate(sms)]
        return sum(terms) / 2.0

    def step(state, batch, key, teacher, text_params, lr_d, lr_n):
        mu, x0, ty = batch["input"], batch["target"], batch["type_idx"]
        img_ctx = batch.get("A_emb") if eng.use_image_context else None
        text_fn = eng._make_text_fn(text_params)
        degra_ctx = None
        if eng.use_degra_context:
            degra_ctx = eng._prompt_embs_nocontext(text_params)[ty][:, None, :]
        B = x0.shape[0]
        bshape = (B,) + (1,) * (x0.ndim - 1)
        k_i, k_e, k_z1 = jax.random.split(key, 3)
        i = jax.random.randint(k_i, (B,), 0, n_pairs)
        th, tm, tl = t_hi[i], t_mid[i], t_lo[i]

        def sd(t):
            return sde.drift_schedule[t].reshape(bshape).astype(x0.dtype)

        def sg(t):
            return sde.sigmas[t].reshape(bshape).astype(x0.dtype)

        # x_t from the forward marginal at the pair's high end (the same
        # draw forward_diffusion makes, at grid-constrained t)
        eps = jax.random.normal(k_e, x0.shape, dtype=x0.dtype)
        x_t = x0 + sd(th) * (mu - x0) + sg(th) * eps

        def teacher_predict(x, tb):
            # sampling-time inputRes contract: drift(x-mu, mu), noise(x-mu, x)
            d_in, n_in = (x - mu, mu), (x - mu, x)
            pd, pn, _, _ = eng._dual_forward(
                teacher["drift"], teacher["noise"], d_in, n_in, tb, ty,
                text_fn, img_ctx, degra_ctx)
            return pd, pn

        # two teacher steps t -> mid at teacher_eta (z1 only matters when
        # the first sub-step is stochastic; second prediction at mid)
        pd1, pn1 = teacher_predict(x_t, th)
        z1 = (jax.random.normal(k_z1, x_t.shape, dtype=x_t.dtype)
              if teacher_eta else jnp.zeros_like(x_t))
        x_mid = sde.reverse_step(None, x_t, th, pd1, pn1, eta=teacher_eta,
                                 t_prev=tm, z=z1)
        pd2, pn2 = teacher_predict(x_mid, tm)

        # increment-weighted composition = exact one-step equivalent of the
        # z1-conditioned two-step mean (z2 is zero-mean and drops out)
        carry1, c1 = sde.posterior_coeffs(sg(th), sg(tm), teacher_eta)
        carry2, _ = sde.posterior_coeffs(sg(tm), sg(tl), teacher_eta)
        dsd1, dsd2 = sd(th) - sd(tm), sd(tm) - sd(tl)
        d_tgt = (dsd1 * pd1 + dsd2 * pd2) / jnp.maximum(dsd1 + dsd2, 1e-8)
        n_num = (sg(th) - carry1) * pn1 + (sg(tm) - carry2) * pn2
        if z1_correction:
            n_num = n_num - c1 * z1
        n_tgt = n_num / jnp.maximum(sg(th) - sg(tl), 1e-8)
        d_tgt = jax.lax.stop_gradient(d_tgt)
        n_tgt = jax.lax.stop_gradient(n_tgt)

        def loss_fn(dparams, nparams):
            d_in, n_in = (x_t - mu, mu), (x_t - mu, x_t)
            pred_drift, pred_noise, d_sms, n_sms = eng._dual_forward(
                dparams, nparams, d_in, n_in, th, ty, text_fn, img_ctx,
                degra_ctx)
            dloss = jnp.mean((pred_drift - d_tgt) ** 2)
            nloss = jnp.mean((pred_noise - n_tgt) ** 2)
            dsml = (sm_loss(d_sms, d_tgt) if (d_sms and eng.use_dsm)
                    else jnp.zeros(()))
            nsml = (sm_loss(n_sms, n_tgt) if (n_sms and eng.use_nsm)
                    else jnp.zeros(()))
            loss = dloss + nloss + dsml + nsml
            return loss, {"l": loss, "dl": dloss, "nl": nloss,
                          "dsml": dsml, "nsml": nsml}

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state["drift"],
                                                   state["noise"])
        d_grads, n_grads = grads
        if axis_name is not None:
            d_grads = jax.lax.pmean(d_grads, axis_name)
            n_grads = jax.lax.pmean(n_grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)

        d_opt_state = state["d_opt"]
        n_opt_state = state["n_opt"]
        d_opt_state.hyperparams["learning_rate"] = lr_d
        n_opt_state.hyperparams["learning_rate"] = lr_n
        d_updates, d_opt_state = eng.drift_opt.update(
            d_grads, d_opt_state, state["drift"])
        n_updates, n_opt_state = eng.noise_opt.update(
            n_grads, n_opt_state, state["noise"])
        new_drift = optax.apply_updates(state["drift"], d_updates)
        new_noise = optax.apply_updates(state["noise"], n_updates)
        step_no = state["step"] + 1
        new_state = {
            "drift": new_drift,
            "noise": new_noise,
            "d_opt": d_opt_state,
            "n_opt": n_opt_state,
            "d_ema": _ema_update(state["d_ema"], new_drift, step_no),
            "n_ema": _ema_update(state["n_ema"], new_noise, step_no),
            "step": step_no,
        }
        return new_state, metrics

    return step


def distill_phase(
    eng: CLIPDriftEngine,
    student_steps: int,
    batches: Iterable[Dict],
    n_steps: int,
    key,
    lr: float = 2e-5,
    ema_as_teacher: bool = True,
    teacher_eta: float = 0.0,
    z1_correction: bool = False,
    log_every: int = 100,
    log_fn=None,
):
    """Run one halving phase in place on ``eng``.

    The phase teacher is a frozen snapshot of the engine's current (EMA by
    default) weights; the student continues from the engine's live state —
    so calling this repeatedly with N, N//2, N//4 ... is progressive
    distillation. ``teacher_eta`` (build_distill_step) picks the teacher
    chain: use it on the FIRST phase to convert the stochastic eta=1
    sampler into a deterministic mean-student, 0 on later phases (their
    teacher is already deterministic). Fresh Adam moments and
    EMA-from-teacher each phase.
    ``batches`` is an (endless) iterator of train-batch dicts. LR is
    cosine-annealed over the phase. Returns the final mean loss."""
    teacher = {
        "drift": jax.tree.map(jnp.copy, eng.state["d_ema" if ema_as_teacher
                                                   else "drift"]),
        "noise": jax.tree.map(jnp.copy, eng.state["n_ema" if ema_as_teacher
                                                  else "noise"]),
    }
    # student starts AT the teacher; fresh optimizer moments + step counter
    # (the EMA warmup gate counts from 0 again)
    eng.state["drift"] = jax.tree.map(jnp.copy, teacher["drift"])
    eng.state["noise"] = jax.tree.map(jnp.copy, teacher["noise"])
    eng.state["d_ema"] = jax.tree.map(jnp.copy, teacher["drift"])
    eng.state["n_ema"] = jax.tree.map(jnp.copy, teacher["noise"])
    eng.state["d_opt"] = eng.drift_opt.init(eng.state["drift"])
    eng.state["n_opt"] = eng.noise_opt.init(eng.state["noise"])
    eng.state["step"] = jnp.zeros((), jnp.int32)

    step_fn = jax.jit(build_distill_step(eng, student_steps,
                                         teacher_eta=teacher_eta,
                                         z1_correction=z1_correction),
                      donate_argnums=(0,))
    eng.reinit_loss_message()
    last = None
    it = iter(batches)
    for s in range(int(n_steps)):
        lr_s = cosine_annealing_lr(s, n_steps, lr, lr * 0.01)
        eng.state, metrics = step_fn(
            eng.state, next(it), jax.random.fold_in(key, s), teacher,
            eng.text_params, jnp.asarray(lr_s, jnp.float32),
            jnp.asarray(lr_s, jnp.float32))
        if log_every and ((s + 1) % log_every == 0 or s == 0):
            metrics = {k: float(v) for k, v in metrics.items()}
            eng._record_losses(metrics)
            last = metrics["l"]
            if log_fn is not None:
                log_fn(s + 1, metrics)
    # distilled weights sample via eng.test(sample_steps=student_steps, eta=0)
    eng._sample_fn = None
    return last
