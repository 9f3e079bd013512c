"""SPMD tests on the virtual 8-CPU-device mesh: dp batch sharding, fsdp
parameter sharding, and the sharded train step (the reference's 2-GPU DDP
path, SURVEY.md SS2.11, re-expressed as mesh shardings)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancediff_tpu.parallel import (
    make_mesh,
    batch_sharding,
    shard_batch,
    shard_params_fsdp,
    replicate_tree,
)
from instancediff_tpu.parallel.mesh import _fsdp_spec


def test_mesh_shapes():
    mesh = make_mesh(("dp",), (8,))
    assert mesh.shape["dp"] == 8
    mesh2 = make_mesh(("dp", "fsdp"), (4, 2))
    assert mesh2.shape["dp"] == 4 and mesh2.shape["fsdp"] == 2
    with pytest.raises(AssertionError):
        make_mesh(("dp",), (3,))


def test_shard_batch_places_on_all_devices():
    mesh = make_mesh(("dp",), (8,))
    batch = {"input": np.ones((8, 4, 4, 1), np.float32), "type_idx": np.zeros(8, np.int32)}
    sharded = shard_batch(mesh, batch)
    assert len(sharded["input"].sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(sharded["input"]), batch["input"])


def test_fsdp_spec_rules():
    mesh = make_mesh(("dp", "fsdp"), (4, 2))
    x = jnp.zeros((6, 8))
    spec = _fsdp_spec(x, mesh)
    assert spec == jax.sharding.PartitionSpec(None, "fsdp")
    # odd shapes replicate
    assert _fsdp_spec(jnp.zeros((3, 5)), mesh) == jax.sharding.PartitionSpec()
    assert _fsdp_spec(jnp.zeros(()), mesh) == jax.sharding.PartitionSpec()


def test_fsdp_roundtrip_values():
    mesh = make_mesh(("dp", "fsdp"), (4, 2))
    params = {"w": jnp.arange(16.0).reshape(4, 4), "b": jnp.ones((3,))}
    sharded = shard_params_fsdp(mesh, params)
    np.testing.assert_allclose(np.asarray(sharded["w"]), np.asarray(params["w"]))
    np.testing.assert_allclose(np.asarray(sharded["b"]), np.asarray(params["b"]))


@pytest.fixture(scope="module")
def tiny_engine():
    from instancediff_tpu.models.drift_model import CLIPDriftEngine
    from instancediff_tpu.sde import DriftSDE

    settings = dict(in_nc=2, out_nc=5, nf=4, ch_mult=[1, 2], context_dim=8,
                    text_module="scoremap", score_map_chan=2,
                    if_MultiScoreMap=True, num_res_blocks=1)
    return CLIPDriftEngine(
        dnet_settings=settings, nnet_settings=settings,
        score_map_ch_mult=(1, 1), score_map_ngf=4,
        use_image_context=True, CLIP_Type="CLIP", tiny_text_encoder=True,
        sde=DriftSDE(T=2, max_sigma=0.4), image_size=8, nepoch=2, seed=0,
    )


def test_sharded_train_step_matches_single_device(tiny_engine):
    """The dp-sharded jitted step must produce the same loss and (replicated)
    parameter update as the unsharded one — XLA's inserted collectives are
    the DDP allreduce."""
    eng = tiny_engine
    k = jax.random.key(0)
    x0 = jax.random.uniform(k, (8, 8, 8, 1)) * 2 - 1
    mu = x0 + 0.2 * jax.random.normal(jax.random.fold_in(k, 1), x0.shape)
    batch = {"input": mu, "target": x0,
             "type_idx": jnp.arange(8, dtype=jnp.int32) % 5,
             "A_emb": jnp.zeros((8, 1, 8))}
    lr = jnp.asarray(1e-3, jnp.float32)
    step_key = jax.random.key(7)

    step_fn = jax.jit(eng.build_train_step())

    # single-device reference
    state0 = jax.tree.map(jnp.copy, eng.state)
    ref_state, ref_metrics = step_fn(state0, batch, step_key, eng.text_params, lr, lr)

    # dp-sharded
    mesh = make_mesh(("dp",), (8,))
    sharded_batch = shard_batch(mesh, batch)
    state1 = replicate_tree(mesh, jax.tree.map(jnp.copy, eng.state))
    text_p = replicate_tree(mesh, eng.text_params)
    new_state, metrics = step_fn(state1, sharded_batch, step_key, text_p, lr, lr)

    assert np.isfinite(float(metrics["l"]))
    np.testing.assert_allclose(float(metrics["l"]), float(ref_metrics["l"]), rtol=1e-5)
    ref_leaf = np.asarray(jax.tree.leaves(ref_state["drift"])[0])
    got_leaf = np.asarray(jax.tree.leaves(new_state["drift"])[0])
    np.testing.assert_allclose(ref_leaf, got_leaf, rtol=1e-4, atol=1e-6)


def test_dp_fsdp_sharded_train_step_matches_single_device(tiny_engine):
    """dp x fsdp (ZeRO-style) sharding must also reproduce the single-device
    step — including the FUSED dual-net path, which requires the
    ConvTranspose `up_*` kernels to stay replicated (XLA SPMD partitioner
    bug, see parallel/mesh.py:FSDP_REPLICATE_PATTERNS)."""
    eng = tiny_engine
    assert eng._can_fuse_dual()
    k = jax.random.key(0)
    x0 = jax.random.uniform(k, (8, 8, 8, 1)) * 2 - 1
    mu = x0 + 0.2 * jax.random.normal(jax.random.fold_in(k, 1), x0.shape)
    batch = {"input": mu, "target": x0,
             "type_idx": jnp.arange(8, dtype=jnp.int32) % 5,
             "A_emb": jnp.zeros((8, 1, 8))}
    lr = jnp.asarray(1e-3, jnp.float32)
    step_key = jax.random.key(7)
    step_fn = jax.jit(eng.build_train_step())

    state0 = jax.tree.map(jnp.copy, eng.state)
    ref_state, ref_metrics = step_fn(state0, batch, step_key, eng.text_params, lr, lr)

    mesh = make_mesh(("dp", "fsdp"), (4, 2))
    sharded_batch = shard_batch(mesh, batch)
    state1 = jax.tree.map(jnp.copy, eng.state)
    state1 = {k2: (replicate_tree(mesh, v) if k2 == "step"
                   else shard_params_fsdp(mesh, v)) for k2, v in state1.items()}
    text_p = shard_params_fsdp(mesh, eng.text_params)
    new_state, metrics = step_fn(state1, sharded_batch, step_key, text_p, lr, lr)

    np.testing.assert_allclose(float(metrics["l"]), float(ref_metrics["l"]), rtol=1e-5)
    for ref_leaf, got_leaf in zip(jax.tree.leaves(ref_state["drift"])[:3],
                                  jax.tree.leaves(new_state["drift"])[:3]):
        np.testing.assert_allclose(np.asarray(ref_leaf), np.asarray(got_leaf),
                                   rtol=1e-4, atol=1e-6)


def test_packed_train_dp_fsdp_matches_single_device():
    """packed_train under dp x fsdp == single device. Notably the packed
    up-conv is a plain lhs-dilated conv, so this path does not depend on
    the ConvTranspose partitioner workaround."""
    from instancediff_tpu.models.drift_model import CLIPDriftEngine
    from instancediff_tpu.sde import DriftSDE

    settings = dict(in_nc=2, out_nc=5, nf=8, ch_mult=[1, 2], context_dim=16,
                    text_module="scoremap", score_map_chan=4,
                    if_MultiScoreMap=True, num_res_blocks=1)
    eng = CLIPDriftEngine(
        dnet_settings=settings, nnet_settings=settings,
        score_map_ch_mult=(1, 1), score_map_ngf=8,
        use_image_context=True, CLIP_Type="CLIP", tiny_text_encoder=True,
        sde=DriftSDE(T=4, max_sigma=0.4), image_size=16, nepoch=2, seed=0,
        packed_train=True)
    mesh = make_mesh(("dp", "fsdp"), (4, 2))
    k = jax.random.key(1)
    x0 = jax.random.uniform(k, (4, 16, 16, 1)) * 2 - 1
    mu = x0 + 0.2 * jax.random.normal(jax.random.fold_in(k, 1), x0.shape)
    batch = {"input": mu, "target": x0,
             "type_idx": jnp.arange(4, dtype=jnp.int32) % 5,
             "A_emb": jnp.zeros((4, 1, 16))}
    step = jax.jit(eng.build_train_step())
    lr = jnp.asarray(1e-3, jnp.float32)
    _, rm = step(jax.tree.map(jnp.copy, eng.state), batch, jax.random.key(0),
                 eng.text_params, lr, lr)
    state = {k2: (replicate_tree(mesh, v) if k2 == "step"
                  else shard_params_fsdp(mesh, v))
             for k2, v in eng.state.items()}
    _, m = step(state, shard_batch(mesh, batch), jax.random.key(0),
                shard_params_fsdp(mesh, eng.text_params), lr, lr)
    np.testing.assert_allclose(float(m["l"]), float(rm["l"]), rtol=1e-5)


def test_fsdp_replicates_conv_transpose_kernels(tiny_engine):
    """The partitioner-bug workaround: every `up_*` leaf must be replicated."""
    mesh = make_mesh(("dp", "fsdp"), (4, 2))
    sharded = shard_params_fsdp(mesh, tiny_engine.state["drift"])
    flat = jax.tree_util.tree_flatten_with_path(sharded)[0]
    seen = 0
    for path, x in flat:
        if "up_" in jax.tree_util.keystr(path):
            seen += 1
            assert x.sharding.spec == jax.sharding.PartitionSpec(), path
    assert seen > 0


def test_dryrun_multichip_entry():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_fresh_subprocess():
    """Run dryrun_multichip exactly like the driver does: a raw interpreter
    with NO env forcing and no conftest. Round 1 failed precisely here
    (MULTICHIP_r01.json rc=1) because only the tests forced the 8-device CPU
    backend; dryrun_multichip must be self-sufficient."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    for var in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES"):
        env.pop(var, None)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"stderr tail: {r.stderr[-2000:]}"
    assert "== single-device" in r.stdout
