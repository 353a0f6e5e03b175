"""antmmf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multimodal training and
inference framework with the capabilities of alipay/Ant-Multi-Modal-Framework.

Layer map (mirrors SURVEY.md §1):
  common/    config, registry, batch structures, checkpoint, meter, task loading
  utils/     flags, logging, timers, text/video utilities
  parallel/  device mesh, sharding rules, collectives (ICI/DCN)
  datasets/  databases, processors, samplers, host data pipeline
  tasks/     multi-dataset task containers
  modules/   encoders, embeddings, transformer blocks, heads, losses, metrics
  ops/       Pallas TPU kernels (flash attention, fused ops)
  models/    registry-registered model families
  trainers/  jitted train/eval loops over pjit-sharded state
  predictors/ online-serving predictors
"""

__version__ = "0.1.0"
