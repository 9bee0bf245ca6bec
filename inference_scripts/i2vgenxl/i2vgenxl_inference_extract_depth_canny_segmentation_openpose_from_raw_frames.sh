#!/bin/bash
python inference.py --model_name i2vgenxl --control_types depth canny normal softedge segmentation lineart openpose \
  --inference_expert_masks 1 1 0 0 1 0 1 --extract_control_conditions True \
  --num_inference_steps 50 --guidance_scale 9.0 --control_guidance_end 1.0 \
  --n_sample_frames 16 --output_fps 16 "$@"
