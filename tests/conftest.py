"""Test config: force an 8-device virtual CPU mesh so distributed paths are
exercised without TPU hardware (SURVEY.md SS4's fake-backend analogue)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

# The axon TPU plugin overrides jax_platforms to "axon,cpu" at import time,
# ignoring the env var — force CPU explicitly before any backend init.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


def train_tiny_engine(dtype_name="float32", n_steps=300, seed=0):
    """One tiny trained engine on synthetic OCT speckle — the shared fixture
    behind the asserted quality gates (test_quality_gates, test_distill):
    ~8 min on this 1-core box, paid once per session per dtype.

    Returns (eng, X0[16], MU[16], EMB[16], TY[16], test_batch[:4])."""
    import jax.numpy as jnp
    import numpy as np

    from instancediff_tpu.data.synthetic import SyntheticMedDataset
    from instancediff_tpu.models.drift_model import CLIPDriftEngine
    from instancediff_tpu.sde import DriftSDE

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
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    eng = CLIPDriftEngine(
        dnet_settings=tiny, nnet_settings=tiny, score_map_ch_mult=(1, 1),
        score_map_ngf=16, use_image_context=True, CLIP_Type="CLIP",
        tiny_text_encoder=True, sde=DriftSDE(T=16, max_sigma=0.3),
        image_size=32, nepoch=100, drift_net_lr=2e-3, noise_net_lr=2e-3,
        seed=seed, dtype=dtype)
    for i in range(n_steps):
        idx = np.random.default_rng(i).choice(16, 8, replace=False)
        batch = {"input": MU[idx], "target": X0[idx], "type_idx": TY[idx],
                 "A_emb": EMB[idx]}
        eng.optimize_parameters(batch, jax.random.key(1000 + i),
                                epoch=i * 100 // n_steps)
    test_batch = {"input": MU[:4], "target": X0[:4], "type_idx": TY[:4],
                  "A_emb": EMB[:4]}
    return eng, X0, MU, EMB, TY, test_batch


@pytest.fixture(scope="session")
def tiny_trained_setup():
    return train_tiny_engine("float32")


@pytest.fixture(scope="session")
def tiny_trained_bf16_setup():
    """bf16-compute twin of ``tiny_trained_setup`` — same data, seed, and
    step count; only ``dtype`` differs (the trained-parity gate's subject,
    VERDICT r4 weak #5)."""
    return train_tiny_engine("bfloat16")
