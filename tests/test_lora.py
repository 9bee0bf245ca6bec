"""LoRA folding parity (`inference.py:374-375` load_lora_weights): merged flax
kernels must equal torch ``W + scale * (alpha/r) * up @ down`` for linear and
conv modules, in both kohya and peft key layouts."""

import numpy as np
import pytest

from ctrl_adapter_tpu.convert.lora import apply_lora
from ctrl_adapter_tpu.convert.torch_to_jax import convert_state_dict


def _base_tree():
    rng = np.random.default_rng(0)
    sd = {
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight":
            rng.standard_normal((8, 8)).astype(np.float32),
        "down_blocks.0.resnets.1.conv1.weight":
            rng.standard_normal((6, 4, 3, 3)).astype(np.float32),
        "down_blocks.0.resnets.1.conv1.bias": np.zeros(6, np.float32),
    }
    return sd, convert_state_dict(sd)


def test_kohya_linear_and_conv_merge():
    rng = np.random.default_rng(1)
    sd, tree = _base_tree()
    down_l = rng.standard_normal((2, 8)).astype(np.float32)
    up_l = rng.standard_normal((8, 2)).astype(np.float32)
    down_c = rng.standard_normal((2, 4, 3, 3)).astype(np.float32)
    up_c = rng.standard_normal((6, 2, 1, 1)).astype(np.float32)
    lora = {
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_down.weight": down_l,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_up.weight": up_l,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".alpha": np.float32(4.0),
        "lora_unet_down_blocks_0_resnets_1_conv1.lora_down.weight": down_c,
        "lora_unet_down_blocks_0_resnets_1_conv1.lora_up.weight": up_c,
    }
    n = apply_lora(tree, lora, scale=0.5)
    assert n == 2

    want_l = (sd["down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"
                 ".weight"] + 0.5 * (4.0 / 2) * (up_l @ down_l))
    got_l = tree["down_blocks_0"]["attentions_0"]["transformer_blocks_0"][
        "attn1"]["to_q"]["kernel"]
    np.testing.assert_allclose(got_l, want_l.T, rtol=1e-5)

    delta_c = (up_c.reshape(6, 2) @ down_c.reshape(2, -1)).reshape(6, 4, 3, 3)
    want_c = (sd["down_blocks.0.resnets.1.conv1.weight"]
              + 0.5 * (2.0 / 2) * delta_c)  # alpha defaults to rank
    got_c = tree["down_blocks_0"]["resnets_1"]["conv1"]["kernel"]
    np.testing.assert_allclose(got_c, want_c.transpose(2, 3, 1, 0), rtol=1e-5)


def test_peft_layout_and_unknown_module():
    rng = np.random.default_rng(2)
    _, tree = _base_tree()
    prefix = "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"
    lora = {
        f"{prefix}.lora_A.weight": rng.standard_normal((2, 8)).astype(np.float32),
        f"{prefix}.lora_B.weight": rng.standard_normal((8, 2)).astype(np.float32),
    }
    assert apply_lora(tree, lora) == 1

    bad = {
        "lora_unet_not_a_module.lora_down.weight": np.zeros((2, 8), np.float32),
        "lora_unet_not_a_module.lora_up.weight": np.zeros((8, 2), np.float32),
    }
    with pytest.raises(KeyError):
        apply_lora(tree, bad)


def test_lora_matches_torch_oracle():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    w = rng.standard_normal((8, 8)).astype(np.float32)
    down = rng.standard_normal((2, 8)).astype(np.float32)
    up = rng.standard_normal((8, 2)).astype(np.float32)
    sd = {"down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight": w}
    tree = convert_state_dict(sd)
    lora = {
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_down.weight": down,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".lora_up.weight": up,
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
        ".alpha": np.float32(2.0),
    }
    apply_lora(tree, lora, scale=0.7)
    x = torch.randn(3, 8)
    base = torch.nn.functional.linear(x, torch.from_numpy(w))
    lora_out = torch.nn.functional.linear(
        torch.nn.functional.linear(x, torch.from_numpy(down)),
        torch.from_numpy(up))
    want = (base + 0.7 * (2.0 / 2) * lora_out).numpy()
    got = x.numpy() @ tree["down_blocks_0"]["attentions_0"][
        "transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
