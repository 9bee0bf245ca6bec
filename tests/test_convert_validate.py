"""Converter validation at REAL checkpoint widths.

The zero-egress image has no released checkpoints, so these tests fabricate
torch state dicts *at the real model configs* (SD-v1.5 ControlNet, SDXL UNet,
SVD UNet + temporal VAE, I2VGen-XL UNet) from the torch mirror modules on the
meta device (no weight memory for shape extraction), run them through the
production converter, and assert `--validate` congruence with ``jax.eval_shape``
init of the target flax modules — the strict-load equivalent of reference
`inference.py:216-254`. Negative cases prove a transposed kernel, a missing
tensor, and an extra tensor each fail.
"""

import numpy as np
import pytest
import torch

from ctrl_adapter_tpu.convert.torch_to_jax import convert_state_dict
from ctrl_adapter_tpu.convert.validate import (
    ConversionValidationError,
    build_target,
    validate_params,
)
from tests.torch_mirrors import (
    AutoencoderKLTemporalDecoderT,
    ControlNetT,
    I2VGenXLUNetT,
    UNet2DConditionModelT,
    UNetSpatioTemporalConditionModelT,
)


def fabricate_state_dict(cls, **kwargs):
    """Real-width key->shape state dict without allocating weights: construct
    the torch mirror on the meta device, then back each tensor with zeros."""
    with torch.device("meta"):
        module = cls(**kwargs)
    return {k: np.zeros(tuple(v.shape), np.float16)
            for k, v in module.state_dict().items()}


# Real released configs (diffusers config.json contents, abridged to the keys
# the converter consumes).
CONTROLNET_CFG = {
    "_class_name": "ControlNetModel",
    "in_channels": 4, "conditioning_channels": 3,
    "block_out_channels": [320, 640, 1280, 1280], "layers_per_block": 2,
    "cross_attention_dim": 768, "attention_head_dim": 8,
    "use_linear_projection": False,
    "conditioning_embedding_out_channels": [16, 32, 96, 256],
}
SDXL_CFG = {
    "_class_name": "UNet2DConditionModel",
    "in_channels": 4, "out_channels": 4,
    "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"],
    "up_block_types": ["CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"],
    "block_out_channels": [320, 640, 1280], "layers_per_block": 2,
    "transformer_layers_per_block": [1, 2, 10],
    "attention_head_dim": [5, 10, 20], "cross_attention_dim": 2048,
    "use_linear_projection": True, "addition_embed_type": "text_time",
    "addition_time_embed_dim": 256,
    "projection_class_embeddings_input_dim": 2816,
}
SVD_CFG = {
    "_class_name": "UNetSpatioTemporalConditionModel",
    "in_channels": 8, "out_channels": 4,
    "block_out_channels": [320, 640, 1280, 1280], "layers_per_block": 2,
    "num_attention_heads": [5, 10, 20, 20], "cross_attention_dim": 1024,
    "addition_time_embed_dim": 256,
    "projection_class_embeddings_input_dim": 768,
}
SVD_VAE_CFG = {
    "_class_name": "AutoencoderKLTemporalDecoder",
    "in_channels": 3, "out_channels": 3, "latent_channels": 4,
    "block_out_channels": [128, 256, 512, 512], "layers_per_block": 2,
    "scaling_factor": 0.18215,
}
I2V_CFG = {
    "_class_name": "I2VGenXLUNet",
    "in_channels": 4, "out_channels": 4,
    "block_out_channels": [320, 640, 1280, 1280], "layers_per_block": 2,
    "attention_head_dim": 64, "cross_attention_dim": 1024,
    "norm_num_groups": 32,
}


def _controlnet_state_dict():
    return fabricate_state_dict(
        ControlNetT, block_out=(320, 640, 1280, 1280), heads=(8, 8, 8, 8),
        cross_dim=768, cond_block_out=(16, 32, 96, 256), layers_per_block=2,
    )


def test_controlnet_real_width_validates():
    params = convert_state_dict(_controlnet_state_dict())
    module, args = build_target("controlnet", CONTROLNET_CFG)
    n = validate_params(params, module, args, label="controlnet")
    assert n > 300  # SD-v1.5 ControlNet has ~340 tensors


def test_transposed_linear_kernel_fails():
    sd = _controlnet_state_dict()
    key = "time_embedding.linear_1.weight"
    sd[key] = np.ascontiguousarray(sd[key].T)  # (out,in) -> (in,out)
    params = convert_state_dict(sd)
    module, args = build_target("controlnet", CONTROLNET_CFG)
    with pytest.raises(ConversionValidationError, match="SHAPE.*time_embedding"):
        validate_params(params, module, args)


def test_untransposed_conv_kernel_fails():
    params = convert_state_dict(_controlnet_state_dict())
    node = params["controlnet_cond_embedding"]["conv_in"]
    # put the kernel back into torch (O,I,kh,kw) layout: a conversion that
    # skipped the conv transpose must be caught
    node["kernel"] = np.ascontiguousarray(np.transpose(node["kernel"], (3, 2, 0, 1)))
    module, args = build_target("controlnet", CONTROLNET_CFG)
    with pytest.raises(ConversionValidationError, match="SHAPE.*conv_in"):
        validate_params(params, module, args)


def test_missing_and_extra_keys_fail():
    sd = _controlnet_state_dict()
    del sd["controlnet_mid_block.weight"]
    sd["bogus_module.weight"] = np.zeros((4, 4), np.float16)
    params = convert_state_dict(sd)
    module, args = build_target("controlnet", CONTROLNET_CFG)
    with pytest.raises(ConversionValidationError) as err:
        validate_params(params, module, args)
    msg = str(err.value)
    assert "MISSING" in msg and "controlnet_mid_block" in msg
    assert "UNEXPECTED" in msg and "bogus_module" in msg


@pytest.mark.slow
def test_sdxl_unet_real_width_validates():
    sd = fabricate_state_dict(
        UNet2DConditionModelT, block_out=(320, 640, 1280), heads=(5, 10, 20),
        cross_dim=2048, layers_per_block=2, transformer_layers=(1, 2, 10),
        use_linear_projection=True, addition_embed_type="text_time",
        addition_time_embed_dim=256, projection_class_embeddings_input_dim=2816,
    )
    params = convert_state_dict(sd)
    module, args = build_target("unet", SDXL_CFG, model_name="sdxl")
    n = validate_params(params, module, args, label="sdxl unet")
    assert n == len(sd)


@pytest.mark.slow
def test_svd_unet_real_width_validates():
    sd = fabricate_state_dict(
        UNetSpatioTemporalConditionModelT,
        block_out=(320, 640, 1280, 1280), heads=(5, 10, 20, 20), cross_dim=1024,
        layers_per_block=2, addition_time_embed_dim=256,
        down_types=("CrossAttnDownBlockSpatioTemporal",) * 3 + ("DownBlockSpatioTemporal",),
        up_types=("UpBlockSpatioTemporal",) + ("CrossAttnUpBlockSpatioTemporal",) * 3,
    )
    params = convert_state_dict(sd)
    module, args = build_target("unet", SVD_CFG)  # model_name inferred from _class_name
    n = validate_params(params, module, args, label="svd unet")
    assert n == len(sd)


@pytest.mark.slow
def test_svd_temporal_vae_real_width_validates():
    sd = fabricate_state_dict(
        AutoencoderKLTemporalDecoderT, block_out=(128, 256, 512, 512),
        layers_per_block=2, latent_channels=4,
    )
    params = convert_state_dict(sd)
    module, args = build_target("vae", SVD_VAE_CFG)
    n = validate_params(params, module, args, label="svd temporal vae")
    assert n == len(sd)


@pytest.mark.slow
def test_i2vgenxl_unet_real_width_validates():
    sd = fabricate_state_dict(
        I2VGenXLUNetT, block_out=(320, 640, 1280, 1280), head_dim=64,
        cross_dim=1024, layers_per_block=2,
    )
    params = convert_state_dict(sd)
    module, args = build_target("unet", I2V_CFG, model_name="i2vgenxl")
    n = validate_params(params, module, args, label="i2vgenxl unet")
    assert n == len(sd)


@pytest.mark.slow
def test_convert_cli_orbax_roundtrip_numerical_parity(tmp_path):
    """Full converter-CLI chain at thin widths: torch state_dict ->
    safetensors + config.json -> convert_component(validate=True) -> orbax
    restore -> flax apply matches the torch mirror forward. Covers the orbax
    save/restore leg the file-level roundtrip tests skip."""
    import json

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from safetensors.torch import save_file

    from ctrl_adapter_tpu.convert.convert_checkpoints import convert_component
    from ctrl_adapter_tpu.models.controlnet import ControlNetConfig, ControlNetModel

    torch.manual_seed(0)
    mirror = ControlNetT(block_out=(32, 32, 64, 64), heads=(4, 4, 4, 4),
                         cross_dim=24, cond_block_out=(8, 8, 16, 16),
                         layers_per_block=2)
    src = tmp_path / "src"
    src.mkdir()
    save_file({k: v.contiguous() for k, v in mirror.state_dict().items()},
              str(src / "diffusion_pytorch_model.safetensors"))
    (src / "config.json").write_text(json.dumps({
        "_class_name": "ControlNetModel", "in_channels": 4,
        "conditioning_channels": 3, "block_out_channels": [32, 32, 64, 64],
        "layers_per_block": 2, "cross_attention_dim": 24,
        "attention_head_dim": 4, "use_linear_projection": False,
        "conditioning_embedding_out_channels": [8, 8, 16, 16],
    }))
    dst = tmp_path / "dst"
    convert_component(str(src), str(dst), "controlnet", validate=True)

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(str(dst / "controlnet"))

    cfg = ControlNetConfig(
        block_out_channels=(32, 32, 64, 64), num_attention_heads=(4, 4, 4, 4),
        cross_attention_dim=24, conditioning_embedding_out_channels=(8, 8, 16, 16))
    module = ControlNetModel(config=cfg)
    rng = np.random.default_rng(1)
    lat = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    t = np.asarray([100.0, 500.0], np.float32)
    ctx = rng.standard_normal((2, 7, 24)).astype(np.float32) * 0.1
    cond = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)

    downs_j, mid_j = jax.jit(
        lambda p, *a: module.apply(p, *a)
    )(restored, jnp.asarray(lat), jnp.asarray(t), jnp.asarray(ctx), jnp.asarray(cond))

    with torch.no_grad():
        downs_t, mid_t = mirror(
            torch.from_numpy(lat).permute(0, 3, 1, 2),
            torch.from_numpy(t),
            torch.from_numpy(ctx),
            torch.from_numpy(cond).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(mid_j), mid_t.permute(0, 2, 3, 1).numpy(), rtol=2e-4, atol=2e-4)
    for dj, dt in zip(downs_j, downs_t):
        np.testing.assert_allclose(
            np.asarray(dj), dt.permute(0, 2, 3, 1).numpy(), rtol=2e-4, atol=2e-4)
