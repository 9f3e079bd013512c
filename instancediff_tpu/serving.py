"""Serving API: load-once, restore-many.

Production-facing wrapper around the drift-diffusion engine for deployment
(the reference has only the script-style testUM driver). A ``Restorer`` owns
a checkpoint + jitted sampler specialised to a fixed batch shape; ragged
request sizes are padded to the compiled batch so every request hits the
same executable (no recompiles in steady state).

Keep ``batch_size`` >= 8 on TPU even for single-image traffic: activation
layouts put batch in the 8-deep sublane dim (B < 8 wastes the difference on
every memory pass) and XLA space-to-batch-rewrites small-batch convs into
catastrophically slow patch shuffles at >=512px — measured 0.19 img/s at
512px batch 2 vs 0.65 at batch 8 (PERF.md round 4), i.e. padding one image
to batch 8 returns the answer ~3.4x sooner than a batch-2 graph.

Usage:
    r = Restorer.from_config("Configurations/config.yml",
                             pth_dir="experiments/x/models", iteration="latest")
    restored = r.restore(images, ["speckle in OCT", ...])   # [N,H,W,1] in [-1,1]
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


class Restorer:
    def __init__(self, engine, batch_size: int = 8, use_ema: bool = True,
                 sample_steps: Optional[int] = None, seed: int = 0,
                 eta: Optional[float] = None, spatial: int = 0):
        import jax

        self.engine = engine
        self.batch_size = int(batch_size)
        self.use_ema = use_ema
        self.sample_steps = sample_steps
        self.eta = eta
        # spatial > 1: shard image H over the first `spatial` devices
        # (parallel/spatial.py) — serving analogue of `testUM --spatial`
        self.spatial = int(spatial or 0)
        self._mesh = None
        self._key = jax.random.key(seed)
        self._count = 0
        from .models.drift_model import ARTIFACT_PROMPTS

        self.type_map = getattr(engine, "type_map", None) or {
            name: i for i, name in enumerate(ARTIFACT_PROMPTS)
        }

    @classmethod
    def from_config(cls, opt_path: str, pth_dir: Optional[str] = None,
                    iteration="latest", use_ema: bool = True,
                    batch_size: int = 8, sample_steps: Optional[int] = None,
                    platform: Optional[str] = None, seed: int = 0,
                    eta: Optional[float] = None, spatial: int = 0):
        import jax

        if platform:
            jax.config.update("jax_platforms", platform)
        import yaml

        from .config import ordered_yaml, dict_to_nonedict
        from .models import create_model
        from .sde import create_sde

        loader, _ = ordered_yaml()
        with open(opt_path) as f:
            opt = dict_to_nonedict(yaml.load(f, Loader=loader))
        which_model = (opt.get("train") or {}).get("which_model") or "DriftNoise"
        model_opt = opt["models"][which_model]
        if opt.get("type_map_ind") and not model_opt.get("type_map_ind"):
            model_opt["type_map_ind"] = opt["type_map_ind"]
        engine = create_model(None, model_opt, phase="test",
                              image_size=(opt.get("resolution") or 224))
        which_sde = (opt.get("train") or {}).get("which_sde") or "driftSDE"
        engine.set_sde(create_sde(opt["sdes"][which_sde]))
        pth = pth_dir or (opt.get("test") or {}).get("pth_dir")
        if pth:
            engine.load(pth, iteration, use_ema=use_ema)
        if (opt.get("test") or {}).get("on_device_emb") \
                and hasattr(engine, "attach_image_tower"):
            # same wiring as testUM: the sampler embeds the degraded input
            # itself — without this a use_image_context model would serve
            # with zero embeddings it never saw in training
            import jax.numpy as jnp

            from .models.clip_vit import build_image_tower

            res = opt.get("resolution") or 224
            tower = build_image_tower(
                embed_dim=engine.context_dim,
                tiny=bool(model_opt.get("tiny_text_encoder")))
            tparams = jax.jit(
                lambda k: tower.init(k, jnp.zeros((1, res, res, 1)))
            )(jax.random.key(7))
            engine.attach_image_tower(tower, tparams)
        r = cls(engine, batch_size=batch_size, use_ema=use_ema,
                sample_steps=sample_steps, seed=seed, eta=eta,
                spatial=spatial)
        if opt.get("type_map_ind"):
            r.type_map = dict(opt["type_map_ind"])
        return r

    def restore(self, images, artifact_types: Sequence[str],
                emb: Optional[np.ndarray] = None) -> np.ndarray:
        """Restore N images ([N,H,W,1] float32 in [-1,1]); padded/chunked to
        the compiled batch size. ``artifact_types`` are prompt names (or a
        single name applied to all)."""
        import jax
        import jax.numpy as jnp

        images = np.asarray(images, dtype=np.float32)
        N = images.shape[0]
        if isinstance(artifact_types, str):
            artifact_types = [artifact_types] * N
        if len(artifact_types) != N:
            raise ValueError(
                f"got {len(artifact_types)} artifact types for {N} images "
                "(pass one name per image, or a single name for all)")
        unknown = sorted({t for t in artifact_types if t not in self.type_map})
        if unknown:
            # a typo'd name must not silently condition on artifact index 0
            raise KeyError(
                f"unknown artifact type(s) {unknown}; "
                f"known: {sorted(self.type_map)}")
        type_idx = np.asarray(
            [self.type_map[t] for t in artifact_types], dtype=np.int32)
        if emb is None:
            emb = np.zeros((N, 1, self.engine.context_dim), dtype=np.float32)

        out = np.empty_like(images)
        B = self.batch_size
        for s in range(0, N, B):
            chunk = slice(s, min(s + B, N))
            n = chunk.stop - chunk.start
            pad = B - n
            batch = {
                "input": jnp.asarray(np.pad(images[chunk], ((0, pad), (0, 0), (0, 0), (0, 0)),
                                            mode="edge")),
                "type_idx": jnp.asarray(np.pad(type_idx[chunk], (0, pad), mode="edge")),
                "A_emb": jnp.asarray(np.pad(emb[chunk], ((0, pad), (0, 0), (0, 0)),
                                            mode="edge")),
            }
            if self.spatial > 1:
                from .parallel import make_mesh, shard_spatial

                if self._mesh is None:
                    self._mesh = make_mesh(
                        ("sp",), (self.spatial,),
                        devices=jax.devices()[: self.spatial])
                batch = shard_spatial(self._mesh, batch)
            self._count += 1
            key = jax.random.fold_in(self._key, self._count)
            pred = self.engine.test(batch, key, use_ema=self.use_ema,
                                    sample_steps=self.sample_steps,
                                    eta=self.eta)
            out[chunk] = np.asarray(pred)[:n]
        return out
