"""ctrl_adapter_tpu: TPU-native JAX/XLA/Pallas rebuild of Ctrl-Adapter.

Adapts frozen, pretrained SD-v1.5 ControlNets to frozen image/video diffusion backbones
(SDXL, I2VGen-XL, SVD) by training only lightweight spatio-temporal adapter blocks.
See SURVEY.md for the structural analysis of the PyTorch reference this framework
re-implements TPU-first.
"""

__version__ = "0.1.0"
