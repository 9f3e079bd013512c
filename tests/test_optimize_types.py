"""Optimize-type variant contracts (the reference's step-variant family,
drift_noise_model.py:242-386)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancediff_tpu.models.drift_model import CLIPDriftEngine
from instancediff_tpu.sde import DriftSDE

TINY = dict(in_nc=2, out_nc=5, nf=4, ch_mult=[1, 2], context_dim=8,
            text_module="scoremap", score_map_chan=2, if_MultiScoreMap=True,
            num_res_blocks=1)


def _engine(optimize_type):
    return CLIPDriftEngine(
        dnet_settings=TINY, nnet_settings=TINY,
        score_map_ch_mult=(1, 1), score_map_ngf=4,
        use_image_context=True, CLIP_Type="CLIP", tiny_text_encoder=True,
        sde=DriftSDE(T=4, max_sigma=0.4), image_size=8, nepoch=2, seed=0,
        drift_net_lr=1e-3, noise_net_lr=1e-3, optimize_type=optimize_type,
    )


def _batch():
    k = jax.random.key(0)
    x0 = jax.random.uniform(k, (2, 8, 8, 1)) * 2 - 1
    mu = x0 + 0.2 * jax.random.normal(jax.random.fold_in(k, 1), x0.shape)
    return {"input": mu, "target": x0, "type_idx": jnp.array([0, 4]),
            "A_emb": jnp.zeros((2, 1, 8))}


@pytest.mark.parametrize("ot", [
    "predict_std_noise_acc_drift",
    "predict_std_noise_scale_drift",
    "predict_x0",
])
def test_variant_train_step_runs(ot):
    eng = _engine(ot)
    loss = eng.optimize_parameters(_batch(), jax.random.key(1))
    assert np.isfinite(loss)
    if ot == "predict_x0":
        assert "x0l=" in eng.get_loss_message()
    else:
        assert "nl=" in eng.get_loss_message()


def test_acc_drift_sampling_rejected():
    eng = _engine("predict_std_noise_acc_drift")
    with pytest.raises(ValueError, match="acc_drift"):
        eng.build_sample_fn()


def test_scale_drift_oracle_sampling():
    """With exact scaled-drift + noise oracles, scale_drift sampling must
    recover x0 (validates the /s_d[t] unscaling in the sampler)."""
    sde = DriftSDE(T=16, max_sigma=0.4)
    k = jax.random.key(2)
    x0 = jax.random.uniform(k, (1, 8, 8, 1)) * 2 - 1
    mu = x0 + 0.3 * jax.random.normal(jax.random.fold_in(k, 1), x0.shape)
    D = mu - x0

    def oracle(x, t_b):
        sd = sde.drift_schedule[t_b].reshape(-1, 1, 1, 1)
        sig = sde.sigmas[t_b].reshape(-1, 1, 1, 1)
        eps = (x - x0 - sd * D) / jnp.maximum(sig, 1e-12)
        # emit SCALED drift, then unscale the way the sampler does
        pd_scaled = sd * D
        d_full = pd_scaled / jnp.maximum(sd, 1e-6)
        return d_full, eps

    out = sde.reverse_ddpm(jax.random.key(3), mu, oracle)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_loss_knobs_take_effect():
    """drift_loss='l1' and noise_loss='uni' change the training loss (the
    reference's legacy-variant knob semantics, drift_noise_model.py:495-507);
    unsupported optimize_target fails loudly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from instancediff_tpu.models.drift_model import CLIPDriftEngine
    from instancediff_tpu.sde import DriftSDE

    TINY = dict(in_nc=2, out_nc=5, nf=4, ch_mult=[1, 2], context_dim=8,
                text_module="scoremap", score_map_chan=2, if_MultiScoreMap=True,
                num_res_blocks=1)

    def build(**kw):
        return CLIPDriftEngine(
            dnet_settings=TINY, nnet_settings=TINY, score_map_ch_mult=(1, 1),
            score_map_ngf=4, use_image_context=True, CLIP_Type="CLIP",
            tiny_text_encoder=True, sde=DriftSDE(T=4, max_sigma=0.4),
            image_size=8, nepoch=2, seed=0, **kw)

    k = jax.random.key(0)
    x0 = jax.random.uniform(k, (2, 8, 8, 1)) * 2 - 1
    batch = {"input": x0 + 0.1, "target": x0,
             "type_idx": jnp.array([0, 4]), "A_emb": jnp.zeros((2, 1, 8))}
    losses = {}
    for name, kw in (("default", {}), ("l1", {"drift_loss": "l1"}),
                     ("uni", {"noise_loss": "uni"})):
        losses[name] = build(**kw).optimize_parameters(batch, jax.random.key(5))
    assert np.isfinite(list(losses.values())).all()
    assert abs(losses["l1"] - losses["default"]) > 1e-8
    assert abs(losses["uni"] - losses["default"]) > 1e-8

    with pytest.raises(ValueError, match="optimize_target"):
        build(optimize_target="x0")
