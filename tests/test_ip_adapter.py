"""IP-Adapter support: image-token projection, extra K/V cross-attention branch,
checkpoint conversion. Parity targets: diffusers ``ImageProjection`` /
``IPAdapterAttnProcessor`` as reached through the reference's
``ip_adapter_image_embeds`` plumbing (`sdxl_controlnet_adapter_pipeline.py:541-591,
1221-1226,1354-1360`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from ctrl_adapter_tpu.nn.attention import Attention
from ctrl_adapter_tpu.nn.embeddings import ImageProjection
from ctrl_adapter_tpu.models.unet_2d import UNet2DConfig, UNet2DConditionModel
from .utils import fake_init


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def test_image_projection_matches_torch():
    """Linear -> reshape -> LayerNorm, torch oracle."""
    rng = np.random.default_rng(0)
    b, d, cross, n = 2, 16, 12, 4
    emb = rng.standard_normal((b, d)).astype(np.float32)

    mod = ImageProjection(cross_attention_dim=cross, num_image_text_embeds=n)
    params = fake_init(mod, jnp.asarray(emb))
    got = np.asarray(mod.apply(params, jnp.asarray(emb)))

    p = params["params"]
    lin = torch.nn.Linear(d, n * cross)
    lin.weight.data = _t(p["image_embeds"]["kernel"]).T
    lin.bias.data = _t(p["image_embeds"]["bias"])
    norm = torch.nn.LayerNorm(cross, eps=1e-5)
    norm.weight.data = _t(p["norm"]["scale"])
    norm.bias.data = _t(p["norm"]["bias"])
    with torch.no_grad():
        want = norm(lin(_t(emb)).reshape(b, n, cross)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_ip_attention_branch_matches_torch():
    """attn(q, text) + scale * attn(q, ip_tokens) before to_out — the
    IPAdapterAttnProcessor composition, against a hand-rolled torch oracle."""
    rng = np.random.default_rng(1)
    b, tq, tk, tip = 2, 6, 5, 4
    dim, heads, hd, cross = 16, 2, 8, 12
    hidden = rng.standard_normal((b, tq, dim)).astype(np.float32)
    ctx = rng.standard_normal((b, tk, cross)).astype(np.float32)
    ip = rng.standard_normal((b, tip, cross)).astype(np.float32)
    scale = 0.7

    attn = Attention(query_dim=dim, heads=heads, dim_head=hd, cross_attention_dim=cross)
    params = fake_init(attn, jnp.asarray(hidden), jnp.asarray(ctx),
                       ip_hidden_states=jnp.asarray(ip))
    got = np.asarray(attn.apply(params, jnp.asarray(hidden), jnp.asarray(ctx),
                                ip_hidden_states=jnp.asarray(ip), ip_scale=scale))

    p = params["params"]

    def torch_mha(q, k, v):
        qh = q.reshape(b, -1, heads, hd).transpose(1, 2)
        kh = k.reshape(b, -1, heads, hd).transpose(1, 2)
        vh = v.reshape(b, -1, heads, hd).transpose(1, 2)
        o = torch.nn.functional.scaled_dot_product_attention(qh, kh, vh)
        return o.transpose(1, 2).reshape(b, -1, heads * hd)

    with torch.no_grad():
        q = _t(hidden) @ _t(p["to_q"]["kernel"])
        k = _t(ctx) @ _t(p["to_k"]["kernel"])
        v = _t(ctx) @ _t(p["to_v"]["kernel"])
        out = torch_mha(q, k, v)
        k_ip = _t(ip) @ _t(p["processor"]["to_k_ip_0"]["kernel"])
        v_ip = _t(ip) @ _t(p["processor"]["to_v_ip_0"]["kernel"])
        out = out + scale * torch_mha(q, k_ip, v_ip)
        want = (out @ _t(p["to_out_0"]["kernel"]) + _t(p["to_out_0"]["bias"])).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def _tiny_ip_config():
    return UNet2DConfig(
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        block_out_channels=(32, 32),
        transformer_layers_per_block=(1, 2),
        num_attention_heads=(2, 2),
        cross_attention_dim=32,
        use_linear_projection=True,
        norm_num_groups=16,
        addition_embed_type="text_time",
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=16 + 48,
        encoder_hid_dim_type="ip_image_proj",
        ip_num_image_text_embeds=4,
        ip_scale=1.0,
    )


def _init_ip_unet(cfg, b=1):
    unet = UNet2DConditionModel(config=cfg)
    x = jnp.ones((b, 8, 8, 4))
    t = jnp.zeros((b,))
    eh = jnp.ones((b, 7, 32)) * 0.1
    added = {"text_embeds": jnp.ones((b, 16)) * 0.1, "time_ids": jnp.ones((b, 6)),
             "image_embeds": jnp.ones((b, 24)) * 0.1}
    params = fake_init(unet, x, t, eh, added)
    return unet, params, (x, t, eh, added)


def _boost_ip_weights(params):
    """fake_init's 0.02-scale weights attenuate the ip branch below float32
    noise after ~5 matmuls; scale the ip-specific slots up so liveness asserts
    have signal."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for path, v in flat.items():
        if "processor" in path or "encoder_hid_proj" in path:
            v = v * 50.0
        out[path] = v
    return flax.traverse_util.unflatten_dict(out)


def test_unet_ip_image_proj_end_to_end():
    cfg = _tiny_ip_config()
    unet, params, (x, t, eh, added) = _init_ip_unet(cfg)
    params = _boost_ip_weights(params)
    tree = params["params"]
    assert "encoder_hid_proj" in tree
    attn2 = tree["down_blocks_1"]["attentions_0"]["transformer_blocks_0"]["attn2"]
    assert "to_k_ip_0" in attn2["processor"]

    out = unet.apply(params, x, t, eh, added)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()

    # different image embeds must change the output through the ip branch
    added2 = dict(added, image_embeds=jnp.ones_like(added["image_embeds"]) * -0.3)
    out2 = unet.apply(params, x, t, eh, added2)
    assert np.abs(np.asarray(out2 - out)).max() > 1e-6


def test_ip_adapter_checkpoint_conversion_covers_tree():
    """A synthetic ip_adapter.safetensors-layout dict (image_proj.* +
    ip_adapter.{1,3,...}) must convert onto exactly the param slots the flax
    UNet creates, and the merged weights must be live in the forward."""
    from ctrl_adapter_tpu.convert.convert_checkpoints import (
        convert_ip_adapter_state_dict,
        merge_ip_adapter,
        sdxl_cross_attention_paths,
    )

    cfg = _tiny_ip_config()
    unet, params, (x, t, eh, added) = _init_ip_unet(cfg)

    paths = sdxl_cross_attention_paths(cfg)
    # tiny config: down_blocks_1 has 2 attentions x 2 transformer layers,
    # up_blocks_0 has 3 attentions x 2 layers, mid 1 x 2
    assert paths[0][:2] == ["down_blocks_1", "attentions_0"]
    assert paths[-1][0] == "mid_block"

    rng = np.random.default_rng(2)
    inner = 2 * 16  # heads * head_dim of width-32 blocks
    sd = {
        "image_proj.proj.weight": rng.standard_normal((4 * 32, 24)).astype(np.float32),
        "image_proj.proj.bias": rng.standard_normal((4 * 32,)).astype(np.float32),
        "image_proj.norm.weight": rng.standard_normal((32,)).astype(np.float32),
        "image_proj.norm.bias": rng.standard_normal((32,)).astype(np.float32),
    }
    for i in range(len(paths)):
        for proj in ("to_k_ip", "to_v_ip"):
            sd[f"ip_adapter.{2 * i + 1}.{proj}.weight"] = rng.standard_normal(
                (inner, 32)).astype(np.float32)

    overlay = convert_ip_adapter_state_dict(sd, cfg)
    merged = merge_ip_adapter(params, overlay)

    # structure identical (no new/missing slots), so module.apply accepts it
    assert jax.tree_util.tree_structure(merged) == jax.tree_util.tree_structure(params)
    out_base = unet.apply(params, x, t, eh, added)
    out_merged = unet.apply(merged, x, t, eh, added)
    assert np.isfinite(np.asarray(out_merged)).all()
    # converted weights actually landed (different from the fake weights)
    assert np.abs(np.asarray(out_merged - out_base)).max() > 1e-6
    # spot-check one kernel transposed into place
    got = merged["params"]["encoder_hid_proj"]["image_projection_layers_0"]["image_embeds"]["kernel"]
    np.testing.assert_allclose(np.asarray(got), sd["image_proj.proj.weight"].T)


@pytest.mark.slow
def test_sdxl_pipeline_ip_adapter_embeds():
    """ip_adapter_image_embeds through generate(): runs and shifts latents."""
    from ctrl_adapter_tpu.models.adapter import ControlNetAdapter
    from ctrl_adapter_tpu.models.controlnet import ControlNetConfig, ControlNetModel
    from ctrl_adapter_tpu.models.vae import AutoencoderKL, VAEConfig
    from ctrl_adapter_tpu.pipelines.sdxl import SDXLControlNetAdapterPipeline

    cfg = _tiny_ip_config()
    unet = UNet2DConditionModel(config=cfg)
    cnet = ControlNetModel(config=ControlNetConfig(
        block_out_channels=(32, 32, 32, 32), num_attention_heads=(4, 4, 4, 4),
        cross_attention_dim=24, conditioning_embedding_out_channels=(8, 8, 16, 16),
        norm_num_groups=16))
    adapter = ControlNetAdapter(
        backbone_model_name="sdxl", num_blocks=1, num_adapters_per_location=1,
        cross_attention_dim=32, adapter_locations=("A",),
        add_temporal_resnet=False, add_temporal_transformer=False,
        custom_down_block_channels=(32,) * 9, attention_head_dim=16)
    vae = AutoencoderKL(config=VAEConfig(block_out_channels=(16,) * 4,
                                         norm_num_groups=8, layers_per_block=1))
    pipe = SDXLControlNetAdapterPipeline(unet=unet, controlnet=cnet, adapter=adapter, vae=vae)

    b = 1
    pe = jnp.ones((2 * b, 7, 32)) * 0.1
    ate = jnp.ones((2 * b, 16)) * 0.1
    cnp_ = jnp.ones((2 * b, 7, 24)) * 0.1
    ci = jnp.ones((b, 64, 64, 3)) * 0.5
    ip_embeds = jnp.ones((b, 24)) * 0.2

    sample = jnp.ones((2 * b, 16, 16, 4))
    t = jnp.zeros((2 * b,))
    pooled8 = jnp.ones((2 * b, 8, 8, 4))
    added = {"text_embeds": ate, "time_ids": jnp.ones((2 * b, 6)),
             "image_embeds": jnp.concatenate([ip_embeds, ip_embeds])}
    params = {
        "unet": _boost_ip_weights(fake_init(unet, sample, t, pe, added)),
        "controlnet": fake_init(cnet, pooled8, t, cnp_, jnp.ones((2 * b, 64, 64, 3))),
        "vae": fake_init(vae, jnp.ones((b, 64, 64, 3))),
    }
    downs_shapes, _ = jax.eval_shape(
        lambda: cnet.apply(params["controlnet"], pooled8, t, cnp_, jnp.ones((2 * b, 64, 64, 3))))
    params["adapter"] = fake_init(
        adapter, [jnp.zeros(s.shape) for s in downs_shapes], None, 1, t, pe)

    kw = dict(height=128, width=128, num_inference_steps=3, guidance_scale=7.5,
              control_guidance_end=0.67, control_latent_size=8, output_type="latent")
    lat1 = pipe.generate(params, jax.random.PRNGKey(0), pe, ate, cnp_, ci,
                         ip_adapter_image_embeds=ip_embeds, **kw)
    lat2 = pipe.generate(params, jax.random.PRNGKey(0), pe, ate, cnp_, ci,
                         ip_adapter_image_embeds=ip_embeds * -2.0, **kw)
    assert np.isfinite(np.asarray(lat1)).all()
    assert np.abs(np.asarray(lat2) - np.asarray(lat1)).max() > 1e-6
