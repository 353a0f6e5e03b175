#!/bin/bash
# 8-virtual-device CPU smoke run (the reference's
# prj/base_vtp/scripts/local_test/coco_vg.local.sh analogue)
set -e
cd "$(dirname "$0")/../../../.."
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
python -m antmmf_tpu.run \
  --config projects/base_vtp/configs/univl_pretrain.local.yml \
  training_parameters.seed 1
