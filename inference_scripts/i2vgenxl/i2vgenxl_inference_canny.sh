#!/bin/bash
python inference.py --model_name i2vgenxl --control_types canny \
  --num_inference_steps 50 --guidance_scale 9.0 --control_guidance_end 0.8 \
  --n_sample_frames 16 --output_fps 16 "$@"
