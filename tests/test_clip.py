"""CLIP text/vision tower parity vs transformers torch-CPU oracles.

The reference's four frozen CLIP towers run through HF transformers
(`model/ctrl_helper.py:33-52`, `train.py:441-466`); our flax ports must match them
numerically so released checkpoints produce identical conditioning. Tiny random
configs keep the oracle hermetic (no downloads).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ctrl_adapter_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextModel,
    CLIPVisionConfig,
    CLIPVisionModel,
    convert_clip_state_dict,
)


def _tiny_text_cfg(act, proj):
    import transformers

    return transformers.CLIPTextConfig(
        vocab_size=99, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=16, hidden_act=act,
        projection_dim=proj or 32, eos_token_id=98,
    )


@pytest.mark.parametrize("act,proj", [("quick_gelu", None), ("gelu", 24)])
def test_clip_text_matches_transformers(act, proj):
    import transformers

    hf_cfg = _tiny_text_cfg(act, proj)
    torch.manual_seed(0)
    if proj is None:
        oracle = transformers.CLIPTextModel(hf_cfg).eval()
    else:
        oracle = transformers.CLIPTextModelWithProjection(hf_cfg).eval()

    ids = torch.tensor([[1, 5, 7, 98, 98, 98], [2, 3, 98, 98, 98, 98]])
    with torch.no_grad():
        out = oracle(ids, output_hidden_states=True)
    want_last = out.last_hidden_state.numpy()
    want_pool = (out.text_embeds if proj else out.pooler_output).numpy()
    want_penult = out.hidden_states[-2].numpy()

    cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=16, hidden_act=act,
        eos_token_id=98, projection_dim=proj,
    )
    model = CLIPTextModel(config=cfg)
    params = {"params": convert_clip_state_dict(
        {k: v.numpy() for k, v in oracle.state_dict().items()})}
    last, pooled, hiddens = model.apply(params, jnp.asarray(ids.numpy()))

    np.testing.assert_allclose(np.asarray(last), want_last, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), want_pool, atol=2e-5)
    np.testing.assert_allclose(np.asarray(hiddens[-2]), want_penult, atol=2e-5)


def test_native_tower_loads_local_dir(tmp_path):
    """text_encoders._load_tower: local diffusers-layout dir -> flax params that
    reproduce the torch tower (the release-checkpoint loading path)."""
    import transformers

    from ctrl_adapter_tpu.models.text_encoders import _load_tower, _text_config
    from ctrl_adapter_tpu.models.clip import CLIPTextModel as FlaxText

    hf_cfg = _tiny_text_cfg("gelu", 24)
    torch.manual_seed(1)
    oracle = transformers.CLIPTextModelWithProjection(hf_cfg).eval()
    oracle.save_pretrained(tmp_path / "text_encoder", safe_serialization=True)

    cfg, params = _load_tower(str(tmp_path), "text_encoder")
    model = FlaxText(config=_text_config(cfg, with_projection=True))
    ids = np.array([[3, 9, 98, 98]])
    with torch.no_grad():
        want = oracle(torch.tensor(ids)).text_embeds.numpy()
    _, pooled, _ = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(pooled), want, atol=2e-5)


def test_clip_vision_matches_transformers():
    import transformers

    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, image_size=32, patch_size=8, projection_dim=24,
        hidden_act="gelu",  # OpenCLIP-H vision (the tower the reference loads)
    )
    torch.manual_seed(0)
    oracle = transformers.CLIPVisionModelWithProjection(hf_cfg).eval()
    pix = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        out = oracle(pix)
    want_embeds = out.image_embeds.numpy()

    cfg = CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, projection_dim=24,
    )
    model = CLIPVisionModel(config=cfg)
    params = {"params": convert_clip_state_dict(
        {k: v.numpy() for k, v in oracle.state_dict().items()})}
    _, embeds = model.apply(params, jnp.asarray(pix.numpy().transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(np.asarray(embeds), want_embeds, atol=3e-5)
