"""CLIPDDPMModel: conditional-DDPM baseline engine.

Reconstruction of the reference's missing ``models/ddpm_model.py``
(config.yml:149-167 ``DDPM`` entry; SURVEY.md SS2.9c): a single conditional
UNet (``LearnableFDUnet.LearnableForwardUNet``, single score map) trained to
predict the injected standard noise of a cosine-alpha DDPM
(sdes.ddpm: max_sigma 1, T 100, schedule cosine_alpha, config.yml:176-180),
conditioned on the degraded input through the second input channel plus the
same text/image context machinery as the drift model.

Contract:
    noise_net(x_t, mu, t) -> eps_hat;  loss = L2(eps_hat, eps) (+ score-map)
    sampling: ancestral DDPM from pure noise, conditioned on mu.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.resize import downsample_label
from ..sde.ddpm_sde import DDPMSDE
from .drift_model import (
    ARTIFACT_PROMPTS,
    _ema_update,
    cosine_annealing_lr,
    make_adam,
)
from .text_encoder import build_text_encoder
from .tokenizer import BertWordPieceTokenizer, ClipBPETokenizer, default_vocab_path
from .unet import LearnableForwardUNetMultiScoreMap


class CLIPDDPMEngine:
    def __init__(
        self,
        net_settings: Dict,
        noise_net_lr=2e-5,
        weight_decay=1e-4,
        beta1=0.9,
        beta2=0.99,
        nepoch=500,
        eta_min=1e-6,
        use_image_context=True,
        use_degra_context=False,
        degrade_on_device=False,  # GT-only pipeline: degrade inside the step
        CLIP_Type="CLIP",
        artifact_prompts=ARTIFACT_PROMPTS,
        image_size=224,
        sde: Optional[DDPMSDE] = None,
        seed=0,
        dtype=jnp.float32,
        if_train=True,
        tiny_text_encoder=False,
        tokenizer_vocab_path=None,
        text_encoder_pretrain_path=None,  # torch ckpt converted when present
        engine_opts=None,  # perf knobs (drift_model.ENGINE_KNOBS subset)
    ):
        from .drift_model import ENGINE_KNOBS

        for k, v in dict(engine_opts or {}).items():
            if k not in ENGINE_KNOBS:
                raise KeyError(
                    f"unknown engine knob {k!r}; valid: {sorted(ENGINE_KNOBS)}")
            setattr(self, k, v)
        self.use_image_context = use_image_context
        self.use_degra_context = use_degra_context
        self.degrade_on_device = bool(degrade_on_device)
        self.nepoch = nepoch
        self.noise_net_lr = noise_net_lr
        self.eta_min = eta_min
        self.sde = sde
        self.clip_type = CLIP_Type
        self.image_size = image_size
        self.net_settings = dict(net_settings)
        self.context_dim = self.net_settings.get("context_dim", 512)
        self.use_sm = self.net_settings.get("text_module") == "scoremap"

        self.text_encoder, token_embed_dim, tok_kind = build_text_encoder(
            CLIP_Type, embed_dim=self.context_dim, dtype=dtype, tiny=tiny_text_encoder)
        if tokenizer_vocab_path is None and not tiny_text_encoder:
            # auto-discover reference vocab assets (same rule as CLIPDriftEngine)
            tokenizer_vocab_path = default_vocab_path(tok_kind)
        if tok_kind == "bert":
            tok = BertWordPieceTokenizer(
                tokenizer_vocab_path, context_length=self.text_encoder.context_length,
                vocab_size=self.text_encoder.vocab_size)
            ids, mask = tok(list(artifact_prompts))
            self.prompt_ids, self.prompt_mask = jnp.asarray(ids), jnp.asarray(mask)
        else:
            tok = ClipBPETokenizer(
                tokenizer_vocab_path, context_length=self.text_encoder.context_length,
                vocab_size=self.text_encoder.vocab_size)
            self.prompt_ids, self.prompt_mask = jnp.asarray(tok(list(artifact_prompts))), None

        key = jax.random.key(seed)
        k_text, k_n = jax.random.split(key)
        probe_ctx = jnp.zeros((8, token_embed_dim))
        if tok_kind == "bert":
            self.text_params = jax.jit(
                lambda kk: self.text_encoder.init(kk, self.prompt_ids, self.prompt_mask,
                                                  probe_ctx))(k_text)
        else:
            self.text_params = jax.jit(
                lambda kk: self.text_encoder.init(kk, self.prompt_ids, probe_ctx))(k_text)
        from .drift_model import _maybe_load_text_pretrain
        self.text_params = _maybe_load_text_pretrain(
            self.text_params, text_encoder_pretrain_path, tok_kind)

        self.noise_net = LearnableForwardUNetMultiScoreMap(
            in_nc=self.net_settings.get("in_nc", 2),
            out_nc=self.net_settings.get("out_nc", 5),
            nf=self.net_settings.get("nf", 64),
            ch_mult=tuple(self.net_settings.get("ch_mult", (1, 2, 4, 4))),
            context_dim=self.context_dim,
            text_module=self.net_settings.get("text_module", "scoremap"),
            score_map_chan=self.net_settings.get("score_map_chan", 16),
            if_MultiScoreMap=False,  # single score map (LearnableForwardUNet)
            score_map_ngf=self.net_settings.get("score_map_ngf", 64),
            use_image_context=use_image_context,
            use_degra_context=use_degra_context,
            token_embed_dim=token_embed_dim,
            num_res_blocks=self.net_settings.get("num_res_blocks", 2),
            # same remat rule as the drift engine: activations at >=128px
            # exceed HBM in the backward without ResBlock rematerialisation
            remat=(image_size >= 128) and if_train,
            dtype=dtype,
        )
        self.n_scales = 1

        H = image_size
        probe = dict(
            x_a=jnp.zeros((1, H, H, 1)), x_b=jnp.zeros((1, H, H, 1)),
            t=jnp.zeros((1,), jnp.int32), ty=jnp.zeros((1,), jnp.int32),
            img=jnp.zeros((1, 1, self.context_dim)) if use_image_context else None,
            deg=jnp.zeros((1, 1, self.context_dim)) if use_degra_context else None,
        )
        text_fn = self._make_text_fn(self.text_params)
        self.noise_params = jax.jit(
            lambda kk: self.noise_net.init(
                kk, probe["x_a"], probe["x_b"], probe["t"], probe["ty"],
                text_fn=text_fn, image_context=probe["img"],
                degra_context=probe["deg"]))(k_n)

        self.if_train = if_train
        if if_train:
            self.opt = make_adam(noise_net_lr, beta1, beta2, weight_decay)
            self.state = {
                "noise": self.noise_params,
                "n_opt": self.opt.init(self.noise_params),
                "n_ema": jax.tree.map(jnp.copy, self.noise_params),
                "step": jnp.zeros((), jnp.int32),
            }
        else:
            self.state = {
                "noise": self.noise_params,
                "n_ema": jax.tree.map(jnp.copy, self.noise_params),
                "step": jnp.zeros((), jnp.int32),
            }
        self.reinit_loss_message()
        self._train_step = None
        self._sample_fn = None

    def _make_text_fn(self, text_params):
        if self.clip_type == "BiomedCLIP":
            return lambda ctx: self.text_encoder.apply(
                text_params, self.prompt_ids, self.prompt_mask, ctx)
        return lambda ctx: self.text_encoder.apply(text_params, self.prompt_ids, ctx)

    def set_sde(self, sde):
        self.sde = sde
        self._train_step = None
        self._sample_fn = None

    # ------------------------------------------------------------------ #

    def build_train_step(self):
        sde = self.sde

        def step_fn(state, batch, key, text_params, lr):
            if self.degrade_on_device:
                # GT-only input pipeline: hosts stream clean targets, the LQ
                # conditioning image is synthesised on-TPU inside the jitted
                # step (same contract as CLIPDriftEngine.build_train_step)
                from ..ops.degradations import apply_degradation

                key, k_deg = jax.random.split(key)
                batch = dict(batch)
                batch["input"] = apply_degradation(
                    k_deg, batch["target"], batch["type_idx"])
            mu, x0, ty = batch["input"], batch["target"], batch["type_idx"]
            img_ctx = batch.get("A_emb") if self.use_image_context else None
            t, x_t, eps = sde.forward_diffusion(key, x0, mu)
            text_fn = self._make_text_fn(text_params)

            def loss_fn(params):
                out = self.noise_net.apply(
                    params, x_t, mu, t.reshape(-1), ty,
                    text_fn=text_fn, image_context=img_ctx)
                pred, sms = out if isinstance(out, tuple) else (out, [])
                nloss = jnp.mean((pred - eps) ** 2)
                sml = (
                    sum(jnp.mean((sm - downsample_label(eps, 2**i)) ** 2)
                        for i, sm in enumerate(sms)) / 2.0
                    if sms else jnp.zeros(())
                )
                loss = nloss + sml
                return loss, {"l": loss, "nl": nloss, "nsml": sml}

            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["noise"])
            opt_state = state["n_opt"]
            opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = self.opt.update(grads, opt_state, state["noise"])
            new_params = optax.apply_updates(state["noise"], updates)
            step = state["step"] + 1
            return {
                "noise": new_params,
                "n_opt": opt_state,
                "n_ema": _ema_update(state["n_ema"], new_params, step),
                "step": step,
            }, metrics

        return step_fn

    def optimize_parameters(self, batch, key, epoch=0):
        if self._train_step is None:
            self._train_step = jax.jit(self.build_train_step(), donate_argnums=(0,))
        lr = cosine_annealing_lr(epoch, self.nepoch, self.noise_net_lr, self.eta_min)
        self.state, metrics = self._train_step(
            self.state, batch, key, self.text_params, jnp.asarray(lr, jnp.float32))
        self._record_losses({k: float(v) for k, v in metrics.items()})
        return float(metrics["l"])

    def build_sample_fn(self, sample_steps=None, eta=None):
        sde = self.sde
        # width-packed level 0 for sampling (same rule as CLIPDriftEngine:
        # exact, TPU-only, even width)
        packed = getattr(self, "packed_l0", None)
        if packed is None:
            packed = jax.default_backend() == "tpu"
        # same exclusions as CLIPDriftEngine: even width, <=1 context token
        # (use_degra_context adds a second), scoremap text module
        packed = (packed and self.image_size % 2 == 0
                  and not self.use_degra_context
                  and self.net_settings.get("text_module",
                                            "scoremap") == "scoremap")
        clone_kw = {}
        if packed:
            clone_kw.update(packed_l0=True, remat=False)
        if getattr(self, "ksplit_dec", False):
            clone_kw["ksplit_dec"] = True
        if getattr(self, "int8_conv", False):
            clone_kw["int8_conv"] = True
        if packed and getattr(self, "decomp_l0", False):
            clone_kw["decomp_l0"] = self.decomp_l0
        if packed and getattr(self, "shift_l0", True) \
                and not getattr(self, "decomp_l0", False) \
                and not getattr(self, "int8_conv", False):
            # shift-alternating level-0 conv pairs (1.33x physical FLOPs;
            # same default as CLIPDriftEngine — engine.shift_l0)
            clone_kw["shift_l0"] = True
        if getattr(self, "flash_mid", False) and jax.default_backend() == "tpu":
            clone_kw["flash_mid"] = True
        if packed and getattr(self, "gnfold_l0", False):
            clone_kw["gnfold_l0"] = True
        if packed and getattr(self, "tapsum_out", True):
            # exact, +1.6% (PERF.md); default ON, engine.tapsum_out = 0 off
            clone_kw["tapsum_out"] = True
        net = self.noise_net.clone(**clone_kw) if clone_kw else self.noise_net

        def sample(params, text_params, mu, type_idx, a_emb, key):
            text_fn = self._make_text_fn(text_params)
            inner = params["params"]
            text_embs = [text_fn(inner["smm_0"]["context"])] if "smm_0" in inner else None
            img_ctx = a_emb if self.use_image_context else None
            # level-0 kernel packing hoisted out of the scan (drift_model
            # rationale; no-op when the packed path is off)
            params_s = net.prepack_params(params)

            def predict(x, t_b):
                out = net.apply(
                    params_s, x, mu, t_b, type_idx,
                    text_embs=text_embs, image_context=img_ctx)
                return out[0] if isinstance(out, tuple) else out

            return sde.reverse_ddpm(key, mu, predict,
                                    sample_steps=sample_steps, eta=eta)

        return sample

    def test(self, batch, key=None, use_ema=True, sample_steps=None, eta=None):
        """``sample_steps < T`` runs the strided DDIM-family sampler (shares
        the grid/posterior machinery family with DriftSDE strided sampling);
        ``eta`` scales the fresh-noise std (default 1 == exact ancestral)."""
        cache_key = (sample_steps, eta)
        if self._sample_fn is None or getattr(self, "_sample_cfg", None) != cache_key:
            self._sample_cfg = cache_key
            self._sample_fn = jax.jit(
                self.build_sample_fn(sample_steps=sample_steps, eta=eta))
        key = jax.random.key(0) if key is None else key
        if self.degrade_on_device and "target" in batch:
            # GT-only dataset: the LQ conditioning image does not exist on
            # disk — synthesise it on device (same op as the train step)
            from ..ops.degradations import apply_degradation_jit

            key, k_deg = jax.random.split(key)
            batch = dict(batch)
            batch["input"] = apply_degradation_jit(
                k_deg, batch["target"], batch["type_idx"])
        params = self.state["n_ema"] if use_ema else self.state["noise"]
        a_emb = batch.get("A_emb")
        if a_emb is None:
            a_emb = jnp.zeros((batch["input"].shape[0], 1, self.context_dim))
        self.output = self._sample_fn(params, self.text_params, batch["input"],
                                      batch["type_idx"], a_emb, key)
        return self.output

    def get_visuals(self):
        return np.asarray(self.output)

    # loss accounting / checkpointing -------------------------------------

    def reinit_loss_message(self):
        keys = ("l", "nl", "nsml")
        self.loss_info = {"latest": {k: 0.0 for k in keys},
                          "avg": {k: 0.0 for k in keys}, "num": 0}

    def _record_losses(self, metrics):
        for k, v in metrics.items():
            self.loss_info["latest"][k] = v
            self.loss_info["avg"][k] += v
        self.loss_info["num"] += 1

    def get_loss_message(self):
        num = max(self.loss_info["num"], 1)
        return "".join(
            "({}={:4f}/{:4f})".format(k, self.loss_info["latest"][k],
                                      self.loss_info["avg"][k] / num)
            for k in self.loss_info["latest"])

    def get_current_learning_rate(self, epoch=0):
        return cosine_annealing_lr(epoch, self.nepoch, self.noise_net_lr, self.eta_min)

    def save(self, models_dir, iteration):
        from ..utils import checkpoint as ckpt

        nn_, np_ = ckpt.split_smm(self.state["noise"])
        ckpt.save_pytree(nn_, f"{models_dir}/{iteration}_NN.ckpt")
        if np_:
            ckpt.save_pytree(np_, f"{models_dir}/{iteration}_NP.ckpt")
        enn, enp = ckpt.split_smm(self.state["n_ema"])
        ckpt.save_pytree(enn, f"{models_dir}/lastest_NN_ema.ckpt")
        if enp:
            ckpt.save_pytree(enp, f"{models_dir}/lastest_NP_ema.ckpt")

    def save_training_state(self, state_dir, epoch, iteration):
        from ..utils import checkpoint as ckpt

        ckpt.save_training_state(
            state_dir, iteration, epoch,
            {"n_opt": self.state["n_opt"], "step": self.state["step"],
             "n_ema": self.state["n_ema"]})

    def load(self, models_dir, iteration, use_ema=False, load_ema=True):
        import os

        from ..utils import checkpoint as ckpt

        nn_t, np_t = ckpt.split_smm(self.state["noise"])
        nn_ = ckpt.load_pytree(nn_t, f"{models_dir}/{iteration}_NN.ckpt")
        np_path = f"{models_dir}/{iteration}_NP.ckpt"
        np_ = ckpt.load_pytree(np_t, np_path) if np_t and os.path.isfile(np_path) else np_t
        self.state["noise"] = ckpt.merge_smm(nn_, np_)
        ema_path = f"{models_dir}/lastest_NN_ema.ckpt"
        if not load_ema:
            self._sample_fn = None
            return
        if os.path.isfile(ema_path):
            enn = ckpt.load_pytree(nn_t, ema_path)
            enp_path = f"{models_dir}/lastest_NP_ema.ckpt"
            enp = (ckpt.load_pytree(np_t, enp_path)
                   if np_t and os.path.isfile(enp_path) else np_t)
            self.state["n_ema"] = ckpt.merge_smm(enn, enp)
        else:
            self.state["n_ema"] = jax.tree.map(jnp.copy, self.state["noise"])
        self._sample_fn = None

    def resume_training(self, state_path):
        from ..utils import checkpoint as ckpt

        opt_tmpl = {"n_opt": self.state["n_opt"], "step": self.state["step"]}
        full_tmpl = dict(opt_tmpl, n_ema=self.state["n_ema"])
        try:
            tree = ckpt.load_training_state(state_path, full_tmpl)
            self.ema_restored = True
        except Exception:
            tree = ckpt.load_training_state(state_path, opt_tmpl)
            self.ema_restored = False
        self.state["n_opt"] = tree["opt"]["n_opt"]
        self.state["step"] = tree["opt"]["step"]
        if self.ema_restored:
            self.state["n_ema"] = tree["opt"]["n_ema"]
        return tree["epoch"], tree["iter"]

    def get_nets(self, use_ema=False):
        return {"noise_net": self.state["n_ema" if use_ema else "noise"]}


# alias names matching the reference config (class_name: CLIPDDPMModel)
CLIPDDPMModel = CLIPDDPMEngine


def create_CLIPDDPMModel(train_opt, model_opt, phase="train", **kwargs):
    return CLIPDDPMEngine(
        net_settings=dict(model_opt["net_settings"]),
        noise_net_lr=model_opt.get("noise_net_lr", 2e-5),
        weight_decay=model_opt.get("weight_decay", 1e-4),
        beta1=model_opt.get("beta1", 0.9),
        beta2=model_opt.get("beta2", 0.99),
        nepoch=(train_opt or {}).get("nepoch", 500),
        eta_min=model_opt.get("eta_min", 1e-6),
        use_image_context=model_opt.get("use_image_context", True),
        use_degra_context=model_opt.get("use_degra_context", False),
        degrade_on_device=bool(model_opt.get("degrade_on_device")),
        CLIP_Type=model_opt.get("CLIP_Type", "CLIP"),
        tiny_text_encoder=bool(model_opt.get("tiny_text_encoder")),
        tokenizer_vocab_path=model_opt.get("tokenizer_vocab_path"),
        text_encoder_pretrain_path=model_opt.get("text_encoder_pretrain_path"),
        engine_opts=model_opt.get("engine"),
        dtype=_resolve_dtype_ddpm(model_opt.get("dtype")),
        if_train=(phase == "train"),
        **kwargs,
    )


def _resolve_dtype_ddpm(name):
    from .drift_model import _resolve_dtype

    return _resolve_dtype(name)
