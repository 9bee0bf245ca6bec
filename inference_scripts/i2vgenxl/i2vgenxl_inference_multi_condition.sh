#!/bin/bash
# 7-expert router fusion; mask order: depth canny normal softedge segmentation lineart openpose
python inference.py --model_name i2vgenxl \
  --control_types depth canny normal softedge segmentation lineart openpose \
  --inference_expert_masks 1 1 0 0 0 0 0 \
  --num_inference_steps 50 --guidance_scale 9.0 --control_guidance_end 1.0 "$@"
