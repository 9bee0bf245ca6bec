#!/bin/bash
python inference.py --model_name svd --control_types softedge \
  --num_inference_steps 25 --control_guidance_end 0.8 --skip_conv_in True \
  --n_sample_frames 14 --output_fps 14 "$@"
