"""InstanceDiff-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for
instance-wise drift score-based diffusion, providing the full capability
surface of the InstanceDiff reference (all-in-one medical image restoration
across five degradation modalities) re-designed TPU-first.

Layer map (mirrors reference layers, see SURVEY.md SS1):
  config/    - YAML option schema (reference options.py semantics)
  utils/     - file/img utilities, metrics, checkpointing
  data/      - dataset JSON index pipeline + epoch-seeded device sharding
  ops/       - attention / norm / resize / degradation compute ops
             (XLA + Pallas TPU kernels)
  models/    - conditional UNets, score-map modules, CLIP text/image towers,
             training engines (CLIPDriftModel / CLIPDDPMModel equivalents)
  sde/       - drift SDE + DDPM SDE + legacy IR-SDE (forward diffusion and
             jitted lax.scan reverse samplers)
  parallel/  - SPMD meshes, shardings, pjit train/eval steps
"""

__version__ = "0.1.0"
