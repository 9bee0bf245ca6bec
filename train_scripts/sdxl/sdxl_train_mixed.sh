#!/bin/bash
# TPU-native equivalent of the reference launcher: one host, data-parallel over all
# local TPU chips via jax.sharding (no accelerate/NCCL).
python train.py --yaml_file configs/sdxl_train_mixed.yaml "$@"
