#!/bin/bash
# 8-virtual-device CPU smoke run (the reference's per-project local_test
# mechanism: prj/snps3_vtp/scripts/local_test/)
set -e
cd "$(dirname "$0")/../../../.."
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
python -m antmmf_tpu.run \
  --config projects/snps3_vtp/configs/snps3_pretrain.local.yml \
  training_parameters.seed 1
