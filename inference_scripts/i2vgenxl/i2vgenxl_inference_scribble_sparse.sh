#!/bin/bash
python inference.py --model_name i2vgenxl --control_types scribble \
  --sparse_frames 0 5 10 15 --skip_conv_in True \
  --num_inference_steps 50 --guidance_scale 9.0 --control_guidance_end 0.8 "$@"
