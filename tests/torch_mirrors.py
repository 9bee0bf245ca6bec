"""Thin-config torch oracles with diffusers semantics for full-tower parity tests.

These mirror the *diffusers/torch* math of the frozen towers the reference uses
(`controlnet/controlnet.py:662-881`, stock ``UNet2DConditionModel``,
``AutoencoderKL``) with state-dict key names identical to the released
checkpoints, so weights travel through the production converter
(`ctrl_adapter_tpu/convert/torch_to_jax.py`) exactly as real checkpoints would.
A transposed kernel, wrong eps, or swapped norm order in the flax stack shows up
as a parity failure here.

Everything is hand-rolled (diffusers itself is not installed in this image) and
kept at diffusers' op ordering; module attribute names define the state-dict
keys and therefore must match diffusers ("net.0.proj", "to_out.0", ...).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------------- embeddings
def timestep_embedding(
    timesteps: torch.Tensor,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: int = 10000,
) -> torch.Tensor:
    half = dim // 2
    exponent = -math.log(max_period) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps.float()[:, None] * torch.exp(exponent)[None, :]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    if dim % 2 == 1:
        emb = F.pad(emb, (0, 1))
    return emb


class TimestepEmbeddingT(nn.Module):
    def __init__(self, in_dim: int, time_embed_dim: int):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, time_embed_dim)
        self.linear_2 = nn.Linear(time_embed_dim, time_embed_dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


# ---------------------------------------------------------------------- attention
class AttentionT(nn.Module):
    def __init__(self, query_dim, heads, dim_head, cross_dim=None):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(cross_dim or query_dim, inner, bias=False)
        self.to_v = nn.Linear(cross_dim or query_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim), nn.Dropout(0.0)])

    def forward(self, x, context=None):
        ctx = x if context is None else context
        b, tq, _ = x.shape
        q = self.to_q(x).view(b, tq, self.heads, self.dim_head).transpose(1, 2)
        k = self.to_k(ctx).view(b, ctx.shape[1], self.heads, self.dim_head).transpose(1, 2)
        v = self.to_v(ctx).view(b, ctx.shape[1], self.heads, self.dim_head).transpose(1, 2)
        out = F.scaled_dot_product_attention(q, k, v)
        out = out.transpose(1, 2).reshape(b, tq, self.heads * self.dim_head)
        return self.to_out[0](out)


class GEGLUT(nn.Module):
    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out * 2)

    def forward(self, x):
        x, gate = self.proj(x).chunk(2, dim=-1)
        return x * F.gelu(gate)


class FeedForwardT(nn.Module):
    def __init__(self, dim, dim_out=None, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = nn.ModuleList(
            [GEGLUT(dim, inner), nn.Dropout(0.0), nn.Linear(inner, dim_out or dim)]
        )

    def forward(self, x):
        for layer in self.net:
            x = layer(x)
        return x


class BasicTransformerBlockT(nn.Module):
    def __init__(self, dim, heads, dim_head, cross_dim=None):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = AttentionT(dim, heads, dim_head)
        self.has_cross = cross_dim is not None
        if self.has_cross:
            self.norm2 = nn.LayerNorm(dim)
            self.attn2 = AttentionT(dim, heads, dim_head, cross_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForwardT(dim)

    def forward(self, x, context=None):
        x = self.attn1(self.norm1(x)) + x
        if self.has_cross:
            x = self.attn2(self.norm2(x), context) + x
        return self.ff(self.norm3(x)) + x


class Transformer2DModelT(nn.Module):
    def __init__(self, heads, dim_head, in_channels, num_layers=1, cross_dim=None,
                 use_linear_projection=False, norm_groups=32):
        super().__init__()
        inner = heads * dim_head
        self.use_linear = use_linear_projection
        self.norm = nn.GroupNorm(norm_groups, in_channels, eps=1e-6)
        if use_linear_projection:
            self.proj_in = nn.Linear(in_channels, inner)
            self.proj_out = nn.Linear(inner, in_channels)
        else:
            self.proj_in = nn.Conv2d(in_channels, inner, 1)
            self.proj_out = nn.Conv2d(inner, in_channels, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlockT(inner, heads, dim_head, cross_dim)
             for _ in range(num_layers)]
        )

    def forward(self, x, context=None):
        b, c, h, w = x.shape
        residual = x
        x = self.norm(x)
        if self.use_linear:
            x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
            x = self.proj_in(x)
        else:
            x = self.proj_in(x)
            inner = x.shape[1]
            x = x.permute(0, 2, 3, 1).reshape(b, h * w, inner)
        for block in self.transformer_blocks:
            x = block(x, context)
        if self.use_linear:
            x = self.proj_out(x)
            x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        else:
            inner = x.shape[-1]
            x = x.reshape(b, h, w, inner).permute(0, 3, 1, 2)
            x = self.proj_out(x)
        return x + residual


# ------------------------------------------------------------------------ resnets
class ResnetBlock2DT(nn.Module):
    def __init__(self, cin, cout=None, temb=None, groups=32, eps=1e-5,
                 output_scale_factor=1.0, time_embedding_norm="default"):
        super().__init__()
        cout = cout or cin
        self.output_scale_factor = output_scale_factor
        self.time_embedding_norm = time_embedding_norm
        self.norm1 = nn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        if temb is not None:
            proj = 2 * cout if time_embedding_norm == "scale_shift" else cout
            self.time_emb_proj = nn.Linear(temb, proj)
        else:
            self.time_emb_proj = None
        self.norm2 = nn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if self.time_emb_proj is not None and temb is not None:
            t = self.time_emb_proj(F.silu(temb))[:, :, None, None]
            if self.time_embedding_norm == "scale_shift":
                scale, shift = t.chunk(2, dim=1)
                h = self.norm2(h) * (1 + scale) + shift
                h = F.silu(h)
            else:
                h = F.silu(self.norm2(h + t))
        else:
            h = F.silu(self.norm2(h))
        h = self.conv2(h)
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return (x + h) / self.output_scale_factor


class Downsample2DT(nn.Module):
    def __init__(self, channels, padding=1):
        super().__init__()
        self.padding = padding
        self.conv = nn.Conv2d(channels, channels, 3, stride=2, padding=padding)

    def forward(self, x):
        if self.padding == 0:
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class Upsample2DT(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.conv = nn.Conv2d(channels, channels, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


# ------------------------------------------------------------------- UNet blocks
class DownBlock2DT(nn.Module):
    def __init__(self, cin, cout, temb, num_layers=2, groups=32, eps=1e-5,
                 add_downsample=True):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2DT(cin if i == 0 else cout, cout, temb, groups, eps)
             for i in range(num_layers)]
        )
        self.downsamplers = (
            nn.ModuleList([Downsample2DT(cout)]) if add_downsample else None
        )

    def forward(self, x, temb):
        states = ()
        for resnet in self.resnets:
            x = resnet(x, temb)
            states += (x,)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            states += (x,)
        return x, states


class CrossAttnDownBlock2DT(nn.Module):
    def __init__(self, cin, cout, temb, heads, cross_dim, num_layers=2,
                 transformer_layers=1, groups=32, eps=1e-5, add_downsample=True,
                 use_linear_projection=False):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2DT(cin if i == 0 else cout, cout, temb, groups, eps)
             for i in range(num_layers)]
        )
        self.attentions = nn.ModuleList(
            [Transformer2DModelT(heads, cout // heads, cout, transformer_layers,
                                 cross_dim, use_linear_projection)
             for _ in range(num_layers)]
        )
        self.downsamplers = (
            nn.ModuleList([Downsample2DT(cout)]) if add_downsample else None
        )

    def forward(self, x, temb, context):
        states = ()
        for resnet, attn in zip(self.resnets, self.attentions):
            x = resnet(x, temb)
            x = attn(x, context)
            states += (x,)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            states += (x,)
        return x, states


class UNetMidBlock2DCrossAttnT(nn.Module):
    def __init__(self, channels, temb, heads, cross_dim, transformer_layers=1,
                 groups=32, eps=1e-5, use_linear_projection=False,
                 output_scale_factor=1.0):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2DT(channels, channels, temb, groups, eps, output_scale_factor),
             ResnetBlock2DT(channels, channels, temb, groups, eps, output_scale_factor)]
        )
        self.attentions = nn.ModuleList(
            [Transformer2DModelT(heads, channels // heads, channels,
                                 transformer_layers, cross_dim, use_linear_projection)]
        )

    def forward(self, x, temb, context):
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x, context)
        return self.resnets[1](x, temb)


class UpBlock2DT(nn.Module):
    def __init__(self, cin, prev_out, cout, temb, num_layers=3, groups=32, eps=1e-5,
                 add_upsample=True):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            skip = cin if i == num_layers - 1 else cout
            rin = prev_out if i == 0 else cout
            resnets.append(ResnetBlock2DT(rin + skip, cout, temb, groups, eps))
        self.resnets = nn.ModuleList(resnets)
        self.upsamplers = nn.ModuleList([Upsample2DT(cout)]) if add_upsample else None

    def forward(self, x, skips, temb):
        for resnet in self.resnets:
            x = torch.cat([x, skips[-1]], dim=1)
            skips = skips[:-1]
            x = resnet(x, temb)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class CrossAttnUpBlock2DT(nn.Module):
    def __init__(self, cin, prev_out, cout, temb, heads, cross_dim, num_layers=3,
                 transformer_layers=1, groups=32, eps=1e-5, add_upsample=True,
                 use_linear_projection=False):
        super().__init__()
        resnets, attentions = [], []
        for i in range(num_layers):
            skip = cin if i == num_layers - 1 else cout
            rin = prev_out if i == 0 else cout
            resnets.append(ResnetBlock2DT(rin + skip, cout, temb, groups, eps))
            attentions.append(
                Transformer2DModelT(heads, cout // heads, cout, transformer_layers,
                                    cross_dim, use_linear_projection))
        self.resnets = nn.ModuleList(resnets)
        self.attentions = nn.ModuleList(attentions)
        self.upsamplers = nn.ModuleList([Upsample2DT(cout)]) if add_upsample else None

    def forward(self, x, skips, temb, context):
        for resnet, attn in zip(self.resnets, self.attentions):
            x = torch.cat([x, skips[-1]], dim=1)
            skips = skips[:-1]
            x = resnet(x, temb)
            x = attn(x, context)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


# --------------------------------------------------------------- ControlNet tower
class ControlNetCondEmbeddingT(nn.Module):
    def __init__(self, embed_channels, block_out=(16, 32, 96, 256)):
        super().__init__()
        self.conv_in = nn.Conv2d(3, block_out[0], 3, padding=1)
        blocks = []
        for i in range(len(block_out) - 1):
            blocks.append(nn.Conv2d(block_out[i], block_out[i], 3, padding=1))
            blocks.append(nn.Conv2d(block_out[i], block_out[i + 1], 3, padding=1, stride=2))
        self.blocks = nn.ModuleList(blocks)
        self.conv_out = nn.Conv2d(block_out[-1], embed_channels, 3, padding=1)

    def forward(self, x):
        x = F.silu(self.conv_in(x))
        for block in self.blocks:
            x = F.silu(block(x))
        return self.conv_out(x)


class ControlNetT(nn.Module):
    """Reference-semantics ControlNet (`controlnet/controlnet.py:662-881`) at an
    arbitrary (thin) config. Residual contract: 12 down + 1 mid zero-conv heads."""

    def __init__(self, block_out=(32, 64, 96, 96), heads=(4, 4, 4, 4), cross_dim=24,
                 cond_block_out=(8, 8, 16, 16), layers_per_block=2, groups=32,
                 eps=1e-5,
                 down_types=("CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
                             "CrossAttnDownBlock2D", "DownBlock2D")):
        super().__init__()
        time_dim = block_out[0] * 4
        self.block_out = block_out
        self.conv_in = nn.Conv2d(4, block_out[0], 3, padding=1)
        self.time_embedding = TimestepEmbeddingT(block_out[0], time_dim)
        self.controlnet_cond_embedding = ControlNetCondEmbeddingT(block_out[0], cond_block_out)

        down_blocks, zero_convs = [], [nn.Conv2d(block_out[0], block_out[0], 1)]
        out_ch = block_out[0]
        for i, btype in enumerate(down_types):
            in_ch, out_ch = out_ch, block_out[i]
            final = i == len(block_out) - 1
            if btype == "CrossAttnDownBlock2D":
                down_blocks.append(CrossAttnDownBlock2DT(
                    in_ch, out_ch, time_dim, heads[i], cross_dim, layers_per_block,
                    1, groups, eps, add_downsample=not final))
            else:
                down_blocks.append(DownBlock2DT(
                    in_ch, out_ch, time_dim, layers_per_block, groups, eps,
                    add_downsample=not final))
            for _ in range(layers_per_block):
                zero_convs.append(nn.Conv2d(out_ch, out_ch, 1))
            if not final:
                zero_convs.append(nn.Conv2d(out_ch, out_ch, 1))
        self.down_blocks = nn.ModuleList(down_blocks)
        self.controlnet_down_blocks = nn.ModuleList(zero_convs)
        self.mid_block = UNetMidBlock2DCrossAttnT(
            block_out[-1], time_dim, heads[-1], cross_dim, 1, groups, eps)
        self.controlnet_mid_block = nn.Conv2d(block_out[-1], block_out[-1], 1)

    def forward(self, sample, timesteps, context, cond, skip_conv_in=False,
                skip_time_emb=False):
        t_emb = timestep_embedding(timesteps, self.block_out[0])
        emb = self.time_embedding(t_emb)
        if skip_time_emb:
            emb = torch.zeros_like(emb)
        sample = self.conv_in(sample)
        if skip_conv_in:
            sample = torch.zeros_like(sample)
        sample = sample + self.controlnet_cond_embedding(cond)
        res_samples = (sample,)
        for block in self.down_blocks:
            if isinstance(block, CrossAttnDownBlock2DT):
                sample, res = block(sample, emb, context)
            else:
                sample, res = block(sample, emb)
            res_samples += res
        sample = self.mid_block(sample, emb, context)
        downs = [zc(r) for zc, r in zip(self.controlnet_down_blocks, res_samples)]
        mid = self.controlnet_mid_block(sample)
        return downs, mid


# ------------------------------------------------------------ UNet2DConditionModel
class UNet2DConditionModelT(nn.Module):
    """Stock diffusers UNet2DConditionModel semantics (SD/SDXL layouts) at a thin
    config, incl. the SDXL `text_time` addition embedding and the ControlNet
    residual-injection branch (`train.py:1384-1391` consumption side)."""

    def __init__(self, block_out=(32, 64, 96), heads=(4, 4, 4), cross_dim=24,
                 layers_per_block=2, transformer_layers=(1, 1, 1), groups=32,
                 eps=1e-5, use_linear_projection=False,
                 down_types=("DownBlock2D", "CrossAttnDownBlock2D", "CrossAttnDownBlock2D"),
                 up_types=("CrossAttnUpBlock2D", "CrossAttnUpBlock2D", "UpBlock2D"),
                 addition_embed_type=None, addition_time_embed_dim=8,
                 projection_class_embeddings_input_dim=None):
        super().__init__()
        time_dim = block_out[0] * 4
        self.block_out = block_out
        self.addition_embed_type = addition_embed_type
        self.addition_time_embed_dim = addition_time_embed_dim
        self.conv_in = nn.Conv2d(4, block_out[0], 3, padding=1)
        self.time_embedding = TimestepEmbeddingT(block_out[0], time_dim)
        if addition_embed_type == "text_time":
            self.add_embedding = TimestepEmbeddingT(
                projection_class_embeddings_input_dim, time_dim)

        down_blocks = []
        out_ch = block_out[0]
        for i, btype in enumerate(down_types):
            in_ch, out_ch = out_ch, block_out[i]
            final = i == len(block_out) - 1
            if btype == "CrossAttnDownBlock2D":
                down_blocks.append(CrossAttnDownBlock2DT(
                    in_ch, out_ch, time_dim, heads[i], cross_dim, layers_per_block,
                    transformer_layers[i], groups, eps, not final,
                    use_linear_projection))
            else:
                down_blocks.append(DownBlock2DT(
                    in_ch, out_ch, time_dim, layers_per_block, groups, eps, not final))
        self.down_blocks = nn.ModuleList(down_blocks)
        self.mid_block = UNetMidBlock2DCrossAttnT(
            block_out[-1], time_dim, heads[-1], cross_dim, transformer_layers[-1],
            groups, eps, use_linear_projection)

        up_blocks = []
        rev = list(reversed(block_out))
        out_ch = rev[0]
        for i, btype in enumerate(up_types):
            prev_out, out_ch = out_ch, rev[i]
            in_ch = rev[min(i + 1, len(block_out) - 1)]
            final = i == len(block_out) - 1
            rev_idx = len(block_out) - 1 - i
            if btype == "CrossAttnUpBlock2D":
                up_blocks.append(CrossAttnUpBlock2DT(
                    in_ch, prev_out, out_ch, time_dim, heads[rev_idx], cross_dim,
                    layers_per_block + 1, transformer_layers[rev_idx], groups, eps,
                    not final, use_linear_projection))
            else:
                up_blocks.append(UpBlock2DT(
                    in_ch, prev_out, out_ch, time_dim, layers_per_block + 1, groups,
                    eps, not final))
        self.up_blocks = nn.ModuleList(up_blocks)
        self.conv_norm_out = nn.GroupNorm(groups, block_out[0], eps=eps)
        self.conv_out = nn.Conv2d(block_out[0], 4, 3, padding=1)

    def forward(self, sample, timesteps, context, added_cond=None,
                down_block_additional_residuals=None,
                mid_block_additional_residual=None):
        emb = self.time_embedding(timestep_embedding(timesteps, self.block_out[0]))
        if self.addition_embed_type == "text_time":
            text_embeds, time_ids = added_cond["text_embeds"], added_cond["time_ids"]
            time_embeds = timestep_embedding(
                time_ids.reshape(-1), self.addition_time_embed_dim)
            time_embeds = time_embeds.reshape(text_embeds.shape[0], -1)
            emb = emb + self.add_embedding(
                torch.cat([text_embeds, time_embeds], dim=-1))
        sample = self.conv_in(sample)
        skips = (sample,)
        for block in self.down_blocks:
            if isinstance(block, CrossAttnDownBlock2DT):
                sample, res = block(sample, emb, context)
            else:
                sample, res = block(sample, emb)
            skips += res
        if down_block_additional_residuals is not None:
            skips = tuple(s + r for s, r in zip(skips, down_block_additional_residuals))
        sample = self.mid_block(sample, emb, context)
        if mid_block_additional_residual is not None:
            sample = sample + mid_block_additional_residual
        n_layers = len(self.down_blocks[0].resnets) + 1
        for block in self.up_blocks:
            res_samples, skips = skips[-n_layers:], skips[:-n_layers]
            if isinstance(block, CrossAttnUpBlock2DT):
                sample = block(sample, res_samples, emb, context)
            else:
                sample = block(sample, res_samples, emb)
        return self.conv_out(F.silu(self.conv_norm_out(sample)))


# -------------------------------------------------------------------------- VAE
class VAEAttentionT(nn.Module):
    def __init__(self, channels, groups=32):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, channels, eps=1e-6)
        self.to_q = nn.Linear(channels, channels)
        self.to_k = nn.Linear(channels, channels)
        self.to_v = nn.Linear(channels, channels)
        self.to_out = nn.ModuleList([nn.Linear(channels, channels), nn.Dropout(0.0)])

    def forward(self, x):
        b, c, h, w = x.shape
        residual = x
        hidden = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q = self.to_q(hidden)[:, None]
        k = self.to_k(hidden)[:, None]
        v = self.to_v(hidden)[:, None]
        out = F.scaled_dot_product_attention(q, k, v)[:, 0]
        out = self.to_out[0](out)
        return out.reshape(b, h, w, c).permute(0, 3, 1, 2) + residual


class VAEMidBlockT(nn.Module):
    def __init__(self, channels, groups=32):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2DT(channels, channels, None, groups, 1e-6),
             ResnetBlock2DT(channels, channels, None, groups, 1e-6)]
        )
        self.attentions = nn.ModuleList([VAEAttentionT(channels, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class _DownEncoderBlockT(nn.Module):
    def __init__(self, cin, cout, num_layers, groups, add_downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2DT(cin if i == 0 else cout, cout, None, groups, 1e-6)
             for i in range(num_layers)]
        )
        self.downsamplers = (
            nn.ModuleList([Downsample2DT(cout, padding=0)]) if add_downsample else None
        )

    def forward(self, x):
        for resnet in self.resnets:
            x = resnet(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class _UpDecoderBlockT(nn.Module):
    def __init__(self, cin, cout, num_layers, groups, add_upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2DT(cin if i == 0 else cout, cout, None, groups, 1e-6)
             for i in range(num_layers)]
        )
        self.upsamplers = nn.ModuleList([Upsample2DT(cout)]) if add_upsample else None

    def forward(self, x):
        for resnet in self.resnets:
            x = resnet(x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class EncoderT(nn.Module):
    def __init__(self, block_out=(16, 16, 16, 16), layers_per_block=2, groups=8,
                 latent_channels=4):
        super().__init__()
        self.conv_in = nn.Conv2d(3, block_out[0], 3, padding=1)
        blocks, out_ch = [], block_out[0]
        for i, ch in enumerate(block_out):
            in_ch, out_ch = out_ch, ch
            blocks.append(_DownEncoderBlockT(
                in_ch, out_ch, layers_per_block, groups, i != len(block_out) - 1))
        self.down_blocks = nn.ModuleList(blocks)
        self.mid_block = VAEMidBlockT(block_out[-1], groups)
        self.conv_norm_out = nn.GroupNorm(groups, block_out[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(block_out[-1], 2 * latent_channels, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for block in self.down_blocks:
            x = block(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class DecoderT(nn.Module):
    def __init__(self, block_out=(16, 16, 16, 16), layers_per_block=2, groups=8,
                 latent_channels=4):
        super().__init__()
        rev = list(reversed(block_out))
        self.conv_in = nn.Conv2d(latent_channels, rev[0], 3, padding=1)
        self.mid_block = VAEMidBlockT(rev[0], groups)
        blocks, out_ch = [], rev[0]
        for i, ch in enumerate(rev):
            in_ch, out_ch = out_ch, ch
            blocks.append(_UpDecoderBlockT(
                in_ch, out_ch, layers_per_block + 1, groups, i != len(rev) - 1))
        self.up_blocks = nn.ModuleList(blocks)
        self.conv_norm_out = nn.GroupNorm(groups, rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], 3, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block(x)
        for block in self.up_blocks:
            x = block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class AutoencoderKLT(nn.Module):
    def __init__(self, block_out=(16, 16, 16, 16), layers_per_block=2, groups=8,
                 latent_channels=4):
        super().__init__()
        self.encoder = EncoderT(block_out, layers_per_block, groups, latent_channels)
        self.decoder = DecoderT(block_out, layers_per_block, groups, latent_channels)
        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(latent_channels, latent_channels, 1)

    def encode_moments(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = moments.chunk(2, dim=1)
        return mean, torch.clamp(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))


def to_jax_params(module: nn.Module) -> dict:
    """state_dict -> flax param tree through the production converter."""
    from ctrl_adapter_tpu.convert.torch_to_jax import convert_state_dict

    return {"params": convert_state_dict(
        {k: v.detach().numpy() for k, v in module.state_dict().items()}
    )}


# ------------------------------------------------------- temporal primitives
class TemporalResnetBlockT(nn.Module):
    """diffusers TemporalResnetBlock: (3,1,1) convs over (B, C, F, H, W)."""

    def __init__(self, cin, cout=None, temb=None, eps=1e-6):
        super().__init__()
        cout = cout or cin
        self.norm1 = nn.GroupNorm(32, cin, eps=eps)
        self.conv1 = nn.Conv3d(cin, cout, (3, 1, 1), padding=(1, 0, 0))
        self.time_emb_proj = nn.Linear(temb, cout) if temb else None
        self.norm2 = nn.GroupNorm(32, cout, eps=eps)
        self.conv2 = nn.Conv3d(cout, cout, (3, 1, 1), padding=(1, 0, 0))
        self.conv_shortcut = nn.Conv3d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if self.time_emb_proj is not None and temb is not None:
            t = self.time_emb_proj(F.silu(temb))
            h = h + t.permute(0, 2, 1)[:, :, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class AlphaBlenderT(nn.Module):
    def __init__(self, alpha=0.5, merge_strategy="learned_with_images",
                 switch_spatial_to_temporal_mix=False):
        super().__init__()
        self.merge_strategy = merge_strategy
        self.switch = switch_spatial_to_temporal_mix
        self.mix_factor = nn.Parameter(torch.Tensor([alpha]))

    def forward(self, x_spatial, x_temporal, image_only_indicator=None):
        if self.merge_strategy == "learned":
            alpha = torch.sigmoid(self.mix_factor)
        else:  # learned_with_images
            alpha = torch.where(
                image_only_indicator.bool(),
                torch.ones(1, 1, device=x_spatial.device),
                torch.sigmoid(self.mix_factor)[..., None])
            if x_spatial.ndim == 5:
                alpha = alpha[:, None, :, None, None]
            elif x_spatial.ndim == 3:
                alpha = alpha.reshape(-1)[:, None, None]
        if self.switch:
            alpha = 1.0 - alpha
        return x_spatial * alpha + x_temporal * (1.0 - alpha)


class SpatioTemporalResBlockT(nn.Module):
    def __init__(self, cin, cout=None, temb=None, eps=1e-6, temporal_eps=None,
                 merge_factor=0.5, merge_strategy="learned_with_images",
                 switch_spatial_to_temporal_mix=False):
        super().__init__()
        cout = cout or cin
        self.spatial_res_block = ResnetBlock2DT(cin, cout, temb, 32, eps)
        self.temporal_res_block = TemporalResnetBlockT(
            cout, cout, temb, temporal_eps if temporal_eps is not None else eps)
        self.time_mixer = AlphaBlenderT(merge_factor, merge_strategy,
                                        switch_spatial_to_temporal_mix)

    def forward(self, x, temb, image_only_indicator):
        num_frames = image_only_indicator.shape[-1]
        x = self.spatial_res_block(x, temb)
        bf, c, h, w = x.shape
        b = bf // num_frames
        x5 = x.reshape(b, num_frames, c, h, w).permute(0, 2, 1, 3, 4)
        temb5 = temb.reshape(b, num_frames, -1) if temb is not None else None
        mixed = self.time_mixer(
            x_spatial=x5, x_temporal=self.temporal_res_block(x5, temb5),
            image_only_indicator=image_only_indicator)
        return mixed.permute(0, 2, 1, 3, 4).reshape(bf, c, h, w)


class TemporalBasicTransformerBlockT(nn.Module):
    def __init__(self, dim, time_mix_inner_dim, heads, dim_head, cross_dim=None):
        super().__init__()
        self.is_res = dim == time_mix_inner_dim
        self.norm_in = nn.LayerNorm(dim)
        self.ff_in = FeedForwardT(dim, dim_out=time_mix_inner_dim)
        self.norm1 = nn.LayerNorm(time_mix_inner_dim)
        self.attn1 = AttentionT(time_mix_inner_dim, heads, dim_head)
        self.has_cross = cross_dim is not None
        if self.has_cross:
            self.norm2 = nn.LayerNorm(time_mix_inner_dim)
            self.attn2 = AttentionT(time_mix_inner_dim, heads, dim_head, cross_dim)
        self.norm3 = nn.LayerNorm(time_mix_inner_dim)
        self.ff = FeedForwardT(time_mix_inner_dim)

    def forward(self, x, num_frames, context=None):
        bf, seq, c = x.shape
        b = bf // num_frames
        x = x.reshape(b, num_frames, seq, c).permute(0, 2, 1, 3).reshape(b * seq, num_frames, c)
        residual = x
        x = self.ff_in(self.norm_in(x))
        if self.is_res:
            x = x + residual
        x = self.attn1(self.norm1(x)) + x
        if self.has_cross:
            x = self.attn2(self.norm2(x), context) + x
        ff_out = self.ff(self.norm3(x))
        x = ff_out + x if self.is_res else ff_out
        return x.reshape(b, seq, num_frames, c).permute(0, 2, 1, 3).reshape(bf, seq, c)


class TransformerSpatioTemporalModelT(nn.Module):
    def __init__(self, heads, dim_head, in_channels, num_layers=1, cross_dim=None):
        super().__init__()
        inner = heads * dim_head
        self.in_channels = in_channels
        self.norm = nn.GroupNorm(32, in_channels, eps=1e-6)
        self.proj_in = nn.Linear(in_channels, inner)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlockT(inner, heads, dim_head, cross_dim)
             for _ in range(num_layers)])
        self.temporal_transformer_blocks = nn.ModuleList(
            [TemporalBasicTransformerBlockT(inner, inner, heads, dim_head, cross_dim)
             for _ in range(num_layers)])
        self.time_pos_embed = TimestepEmbeddingT2(in_channels, in_channels * 4, in_channels)
        self.time_mixer = AlphaBlenderT(0.5, "learned_with_images")
        self.proj_out = nn.Linear(inner, in_channels)

    def forward(self, x, context, image_only_indicator):
        bf, c, h, w = x.shape
        num_frames = image_only_indicator.shape[-1]
        b = bf // num_frames
        tc_first = context[None, :].reshape(b, num_frames, -1, context.shape[-1])[:, 0]
        time_context = tc_first[None, :].broadcast_to(
            h * w, b, tc_first.shape[1], tc_first.shape[2])
        time_context = time_context.reshape(h * w * b, -1, tc_first.shape[2])

        residual = x
        x = self.norm(x).permute(0, 2, 3, 1).reshape(bf, h * w, c)
        x = self.proj_in(x)
        frame_idx = torch.arange(num_frames).repeat(b, 1).reshape(-1)
        emb = self.time_pos_embed(
            timestep_embedding(frame_idx, self.in_channels))[:, None, :]
        for block, tblock in zip(self.transformer_blocks, self.temporal_transformer_blocks):
            x = block(x, context)
            x_mix = tblock(x + emb, num_frames, time_context)
            x = self.time_mixer(x_spatial=x, x_temporal=x_mix,
                                image_only_indicator=image_only_indicator)
        x = self.proj_out(x)
        return x.reshape(bf, h, w, c).permute(0, 3, 1, 2) + residual


class TimestepEmbeddingT2(nn.Module):
    """TimestepEmbedding with distinct out_dim (diffusers time_pos_embed)."""

    def __init__(self, in_dim, hidden, out_dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, hidden)
        self.linear_2 = nn.Linear(hidden, out_dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


# ------------------------------------------------------------- SVD UNet blocks
class DownBlockSpatioTemporalT(nn.Module):
    def __init__(self, cin, cout, temb, num_layers=2, add_downsample=True):
        super().__init__()
        self.resnets = nn.ModuleList(
            [SpatioTemporalResBlockT(cin if i == 0 else cout, cout, temb, eps=1e-5)
             for i in range(num_layers)])
        self.downsamplers = (
            nn.ModuleList([Downsample2DT(cout)]) if add_downsample else None)

    def forward(self, x, temb, image_only_indicator):
        states = ()
        for resnet in self.resnets:
            x = resnet(x, temb, image_only_indicator)
            states += (x,)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            states += (x,)
        return x, states


class CrossAttnDownBlockSpatioTemporalT(nn.Module):
    def __init__(self, cin, cout, temb, heads, cross_dim, num_layers=2,
                 transformer_layers=1, add_downsample=True):
        super().__init__()
        self.resnets = nn.ModuleList(
            [SpatioTemporalResBlockT(cin if i == 0 else cout, cout, temb, eps=1e-6)
             for i in range(num_layers)])
        self.attentions = nn.ModuleList(
            [TransformerSpatioTemporalModelT(heads, cout // heads, cout,
                                             transformer_layers, cross_dim)
             for _ in range(num_layers)])
        self.downsamplers = (
            nn.ModuleList([Downsample2DT(cout)]) if add_downsample else None)

    def forward(self, x, temb, context, image_only_indicator):
        states = ()
        for resnet, attn in zip(self.resnets, self.attentions):
            x = resnet(x, temb, image_only_indicator)
            x = attn(x, context, image_only_indicator)
            states += (x,)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            states += (x,)
        return x, states


class UNetMidBlockSpatioTemporalT(nn.Module):
    def __init__(self, channels, temb, heads, cross_dim, transformer_layers=1):
        super().__init__()
        self.resnets = nn.ModuleList(
            [SpatioTemporalResBlockT(channels, channels, temb, eps=1e-5),
             SpatioTemporalResBlockT(channels, channels, temb, eps=1e-5)])
        self.attentions = nn.ModuleList(
            [TransformerSpatioTemporalModelT(heads, channels // heads, channels,
                                             transformer_layers, cross_dim)])

    def forward(self, x, temb, context, image_only_indicator):
        x = self.resnets[0](x, temb, image_only_indicator)
        x = self.attentions[0](x, context, image_only_indicator)
        return self.resnets[1](x, temb, image_only_indicator)


class UpBlockSpatioTemporalT(nn.Module):
    def __init__(self, cin, prev_out, cout, temb, num_layers=3, add_upsample=True):
        super().__init__()
        resnets = []
        for i in range(num_layers):
            skip = cin if i == num_layers - 1 else cout
            rin = prev_out if i == 0 else cout
            resnets.append(SpatioTemporalResBlockT(rin + skip, cout, temb, eps=1e-5))
        self.resnets = nn.ModuleList(resnets)
        self.upsamplers = nn.ModuleList([Upsample2DT(cout)]) if add_upsample else None

    def forward(self, x, skips, temb, image_only_indicator):
        for resnet in self.resnets:
            x = torch.cat([x, skips[-1]], dim=1)
            skips = skips[:-1]
            x = resnet(x, temb, image_only_indicator)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class CrossAttnUpBlockSpatioTemporalT(nn.Module):
    def __init__(self, cin, prev_out, cout, temb, heads, cross_dim, num_layers=3,
                 transformer_layers=1, add_upsample=True):
        super().__init__()
        resnets, attentions = [], []
        for i in range(num_layers):
            skip = cin if i == num_layers - 1 else cout
            rin = prev_out if i == 0 else cout
            resnets.append(SpatioTemporalResBlockT(rin + skip, cout, temb, eps=1e-6))
            attentions.append(TransformerSpatioTemporalModelT(
                heads, cout // heads, cout, transformer_layers, cross_dim))
        self.resnets = nn.ModuleList(resnets)
        self.attentions = nn.ModuleList(attentions)
        self.upsamplers = nn.ModuleList([Upsample2DT(cout)]) if add_upsample else None

    def forward(self, x, skips, temb, context, image_only_indicator):
        for resnet, attn in zip(self.resnets, self.attentions):
            x = torch.cat([x, skips[-1]], dim=1)
            skips = skips[:-1]
            x = resnet(x, temb, image_only_indicator)
            x = attn(x, context, image_only_indicator)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class UNetSpatioTemporalConditionModelT(nn.Module):
    """SVD UNet semantics (`unet_spatio_temporal_condition.py:364-490`) at a thin
    config, incl. residual injection."""

    def __init__(self, block_out=(32, 64, 64), heads=(4, 4, 4), cross_dim=24,
                 layers_per_block=2, addition_time_embed_dim=8,
                 down_types=("CrossAttnDownBlockSpatioTemporal",
                             "CrossAttnDownBlockSpatioTemporal",
                             "DownBlockSpatioTemporal"),
                 up_types=("UpBlockSpatioTemporal",
                           "CrossAttnUpBlockSpatioTemporal",
                           "CrossAttnUpBlockSpatioTemporal")):
        super().__init__()
        time_dim = block_out[0] * 4
        self.block_out = block_out
        self.addition_time_embed_dim = addition_time_embed_dim
        self.conv_in = nn.Conv2d(8, block_out[0], 3, padding=1)
        self.time_embedding = TimestepEmbeddingT(block_out[0], time_dim)
        self.add_embedding = TimestepEmbeddingT(3 * addition_time_embed_dim, time_dim)

        down_blocks = []
        out_ch = block_out[0]
        for i, btype in enumerate(down_types):
            in_ch, out_ch = out_ch, block_out[i]
            final = i == len(block_out) - 1
            if btype.startswith("CrossAttn"):
                down_blocks.append(CrossAttnDownBlockSpatioTemporalT(
                    in_ch, out_ch, time_dim, heads[i], cross_dim, layers_per_block,
                    1, not final))
            else:
                down_blocks.append(DownBlockSpatioTemporalT(
                    in_ch, out_ch, time_dim, layers_per_block, not final))
        self.down_blocks = nn.ModuleList(down_blocks)
        self.mid_block = UNetMidBlockSpatioTemporalT(
            block_out[-1], time_dim, heads[-1], cross_dim)

        up_blocks = []
        rev = list(reversed(block_out))
        rev_heads = list(reversed(heads))
        out_ch = rev[0]
        for i, btype in enumerate(up_types):
            prev_out, out_ch = out_ch, rev[i]
            in_ch = rev[min(i + 1, len(block_out) - 1)]
            final = i == len(block_out) - 1
            if btype.startswith("CrossAttn"):
                up_blocks.append(CrossAttnUpBlockSpatioTemporalT(
                    in_ch, prev_out, out_ch, time_dim, rev_heads[i], cross_dim,
                    layers_per_block + 1, 1, not final))
            else:
                up_blocks.append(UpBlockSpatioTemporalT(
                    in_ch, prev_out, out_ch, time_dim, layers_per_block + 1, not final))
        self.up_blocks = nn.ModuleList(up_blocks)
        self.conv_norm_out = nn.GroupNorm(32, block_out[0], eps=1e-5)
        self.conv_out = nn.Conv2d(block_out[0], 4, 3, padding=1)

    def forward(self, sample, timesteps, context, added_time_ids,
                down_block_additional_residuals=None,
                mid_block_additional_residual=None):
        b, num_frames = sample.shape[:2]
        emb = self.time_embedding(timestep_embedding(timesteps, self.block_out[0]))
        time_embeds = timestep_embedding(
            added_time_ids.flatten(), self.addition_time_embed_dim).reshape(b, -1)
        emb = emb + self.add_embedding(time_embeds)
        sample = sample.flatten(0, 1)
        emb = emb.repeat_interleave(num_frames, dim=0)
        context = context.repeat_interleave(num_frames, dim=0)
        image_only_indicator = torch.zeros(b, num_frames)
        sample = self.conv_in(sample)
        skips = (sample,)
        for block in self.down_blocks:
            if isinstance(block, CrossAttnDownBlockSpatioTemporalT):
                sample, res = block(sample, emb, context, image_only_indicator)
            else:
                sample, res = block(sample, emb, image_only_indicator)
            skips += res
        if down_block_additional_residuals is not None:
            skips = tuple(s + r for s, r in zip(skips, down_block_additional_residuals))
        sample = self.mid_block(sample, emb, context, image_only_indicator)
        if mid_block_additional_residual is not None:
            sample = sample + mid_block_additional_residual
        n_layers = len(self.down_blocks[0].resnets) + 1
        for block in self.up_blocks:
            res_samples, skips = skips[-n_layers:], skips[:-n_layers]
            if isinstance(block, CrossAttnUpBlockSpatioTemporalT):
                sample = block(sample, res_samples, emb, context, image_only_indicator)
            else:
                sample = block(sample, res_samples, emb, image_only_indicator)
        sample = self.conv_out(F.silu(self.conv_norm_out(sample)))
        return sample.reshape(b, num_frames, *sample.shape[1:])


# ------------------------------------------------------------ temporal-decoder VAE
class MidBlockTemporalDecoderT(nn.Module):
    def __init__(self, channels, num_layers=2, attention_head_dim=None):
        super().__init__()
        self.resnets = nn.ModuleList(
            [SpatioTemporalResBlockT(channels, channels, None, eps=1e-6,
                                     temporal_eps=1e-5, merge_factor=0.0,
                                     merge_strategy="learned",
                                     switch_spatial_to_temporal_mix=True)
             for _ in range(num_layers)])
        self.attentions = nn.ModuleList([VAEAttentionT(channels)])

    def forward(self, x, image_only_indicator):
        x = self.resnets[0](x, None, image_only_indicator)
        for resnet in self.resnets[1:]:
            x = self.attentions[0](x)
            x = resnet(x, None, image_only_indicator)
        return x


class UpBlockTemporalDecoderT(nn.Module):
    def __init__(self, cin, cout, num_layers=3, add_upsample=True):
        super().__init__()
        self.resnets = nn.ModuleList(
            [SpatioTemporalResBlockT(cin if i == 0 else cout, cout, None, eps=1e-6,
                                     temporal_eps=1e-5, merge_factor=0.0,
                                     merge_strategy="learned",
                                     switch_spatial_to_temporal_mix=True)
             for i in range(num_layers)])
        self.upsamplers = nn.ModuleList([Upsample2DT(cout)]) if add_upsample else None

    def forward(self, x, image_only_indicator):
        for resnet in self.resnets:
            x = resnet(x, None, image_only_indicator)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class TemporalDecoderT(nn.Module):
    def __init__(self, block_out=(32, 32, 32, 32), layers_per_block=2,
                 latent_channels=4):
        super().__init__()
        rev = list(reversed(block_out))
        self.conv_in = nn.Conv2d(latent_channels, rev[0], 3, padding=1)
        self.mid_block = MidBlockTemporalDecoderT(rev[0], layers_per_block)
        blocks, out_ch = [], rev[0]
        for i, ch in enumerate(rev):
            in_ch, out_ch = out_ch, ch
            blocks.append(UpBlockTemporalDecoderT(
                in_ch, out_ch, layers_per_block + 1, i != len(rev) - 1))
        self.up_blocks = nn.ModuleList(blocks)
        self.conv_norm_out = nn.GroupNorm(32, rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], 3, 3, padding=1)
        self.time_conv_out = nn.Conv3d(3, 3, (3, 1, 1), padding=(1, 0, 0))

    def forward(self, z, num_frames):
        bf = z.shape[0]
        b = bf // num_frames
        image_only_indicator = torch.zeros(b, num_frames)
        x = self.conv_in(z)
        x = self.mid_block(x, image_only_indicator)
        for block in self.up_blocks:
            x = block(x, image_only_indicator)
        x = self.conv_out(F.silu(self.conv_norm_out(x)))
        c, h, w = x.shape[1:]
        x5 = x.reshape(b, num_frames, c, h, w).permute(0, 2, 1, 3, 4)
        x5 = self.time_conv_out(x5)
        return x5.permute(0, 2, 1, 3, 4).reshape(bf, c, h, w)


class AutoencoderKLTemporalDecoderT(nn.Module):
    def __init__(self, block_out=(32, 32, 32, 32), layers_per_block=2,
                 latent_channels=4):
        super().__init__()
        self.encoder = EncoderT(block_out, layers_per_block, 32, latent_channels)
        self.decoder = TemporalDecoderT(block_out, layers_per_block, latent_channels)
        self.quant_conv = nn.Conv2d(2 * latent_channels, 2 * latent_channels, 1)

    def encode_moments(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = moments.chunk(2, dim=1)
        return mean, torch.clamp(logvar, -30.0, 20.0)


# ---------------------------------------------------------------- I2VGen-XL UNet
class TemporalConvLayerT(nn.Module):
    """diffusers TemporalConvLayer: 4 GN/SiLU/(3,1,1)-conv stages over
    (B, C, F, H, W), residual; conv indices follow nn.Sequential layouts."""

    def __init__(self, in_dim, out_dim=None, groups=32):
        super().__init__()
        out_dim = out_dim or in_dim
        self.conv1 = nn.Sequential(
            nn.GroupNorm(groups, in_dim), nn.SiLU(),
            nn.Conv3d(in_dim, out_dim, (3, 1, 1), padding=(1, 0, 0)))
        self.conv2 = nn.Sequential(
            nn.GroupNorm(groups, out_dim), nn.SiLU(), nn.Dropout(0.0),
            nn.Conv3d(out_dim, in_dim, (3, 1, 1), padding=(1, 0, 0)))
        self.conv3 = nn.Sequential(
            nn.GroupNorm(groups, in_dim), nn.SiLU(), nn.Dropout(0.0),
            nn.Conv3d(in_dim, in_dim, (3, 1, 1), padding=(1, 0, 0)))
        self.conv4 = nn.Sequential(
            nn.GroupNorm(groups, in_dim), nn.SiLU(), nn.Dropout(0.0),
            nn.Conv3d(in_dim, in_dim, (3, 1, 1), padding=(1, 0, 0)))

    def forward(self, x, num_frames):
        bf, c, h, w = x.shape
        b = bf // num_frames
        x = x.reshape(b, num_frames, c, h, w).permute(0, 2, 1, 3, 4)
        identity = x
        x = self.conv4(self.conv3(self.conv2(self.conv1(x))))
        x = identity + x
        return x.permute(0, 2, 1, 3, 4).reshape(bf, c, h, w)


class TransformerTemporalModelT(nn.Module):
    def __init__(self, heads, dim_head, in_channels, num_layers=1, groups=32):
        super().__init__()
        inner = heads * dim_head
        self.norm = nn.GroupNorm(groups, in_channels, eps=1e-6)
        self.proj_in = nn.Linear(in_channels, inner)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlockT(inner, heads, dim_head)
             for _ in range(num_layers)])
        self.proj_out = nn.Linear(inner, in_channels)

    def forward(self, x, num_frames):
        bf, c, h, w = x.shape
        b = bf // num_frames
        residual = x
        x = x.reshape(b, num_frames, c, h, w)
        x = x.permute(0, 2, 1, 3, 4)  # (b, c, f, h, w) for GN over (f, h, w)
        x = self.norm(x)
        x = x.permute(0, 3, 4, 2, 1).reshape(b * h * w, num_frames, c)
        x = self.proj_in(x)
        for block in self.transformer_blocks:
            x = block(x)
        x = self.proj_out(x)
        x = x.reshape(b, h, w, num_frames, c).permute(0, 3, 4, 1, 2).reshape(bf, c, h, w)
        return x + residual


class _GELUActT(nn.Module):
    """diffusers GELU activation module (key ``proj``)."""

    def __init__(self, dim_in, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim_in, dim_out)

    def forward(self, x):
        return F.gelu(self.proj(x))


class I2VGenXLTransformerTemporalEncoderT(nn.Module):
    def __init__(self, dim, heads, dim_head, ff_inner_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = AttentionT(dim, heads, dim_head)
        self.ff = nn.Module()
        self.ff.net = nn.ModuleList([
            _GELUActT(dim, ff_inner_dim), nn.Dropout(0.0),
            nn.Linear(ff_inner_dim, dim)])

    def forward(self, x):
        attn = self.attn1(self.norm1(x))
        x = attn + x
        h = self.ff.net[0](x)
        return self.ff.net[2](h) + x


class DownBlock3DT(nn.Module):
    def __init__(self, cin, cout, temb, num_layers=2, groups=32, add_downsample=True):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2DT(cin if i == 0 else cout, cout, temb, groups)
             for i in range(num_layers)])
        self.temp_convs = nn.ModuleList(
            [TemporalConvLayerT(cout, cout, groups) for _ in range(num_layers)])
        self.downsamplers = (
            nn.ModuleList([Downsample2DT(cout)]) if add_downsample else None)

    def forward(self, x, temb, num_frames):
        states = ()
        for resnet, tconv in zip(self.resnets, self.temp_convs):
            x = tconv(resnet(x, temb), num_frames)
            states += (x,)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            states += (x,)
        return x, states


class CrossAttnDownBlock3DT(nn.Module):
    def __init__(self, cin, cout, temb, head_dim, cross_dim, num_layers=2,
                 groups=32, add_downsample=True):
        super().__init__()
        heads = cout // head_dim
        self.resnets = nn.ModuleList(
            [ResnetBlock2DT(cin if i == 0 else cout, cout, temb, groups)
             for i in range(num_layers)])
        self.temp_convs = nn.ModuleList(
            [TemporalConvLayerT(cout, cout, groups) for _ in range(num_layers)])
        self.attentions = nn.ModuleList(
            [Transformer2DModelT(heads, head_dim, cout, 1, cross_dim,
                                 norm_groups=groups)
             for _ in range(num_layers)])
        self.temp_attentions = nn.ModuleList(
            [TransformerTemporalModelT(heads, head_dim, cout, 1, groups)
             for _ in range(num_layers)])
        self.downsamplers = (
            nn.ModuleList([Downsample2DT(cout)]) if add_downsample else None)

    def forward(self, x, temb, context, num_frames):
        states = ()
        for resnet, tconv, attn, tattn in zip(
                self.resnets, self.temp_convs, self.attentions, self.temp_attentions):
            x = tconv(resnet(x, temb), num_frames)
            x = attn(x, context)
            x = tattn(x, num_frames)
            states += (x,)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            states += (x,)
        return x, states


class UNetMidBlock3DCrossAttnT(nn.Module):
    def __init__(self, channels, temb, head_dim, cross_dim, groups=32):
        super().__init__()
        heads = channels // head_dim
        self.resnets = nn.ModuleList(
            [ResnetBlock2DT(channels, channels, temb, groups),
             ResnetBlock2DT(channels, channels, temb, groups)])
        self.temp_convs = nn.ModuleList(
            [TemporalConvLayerT(channels, channels, groups),
             TemporalConvLayerT(channels, channels, groups)])
        self.attentions = nn.ModuleList(
            [Transformer2DModelT(heads, head_dim, channels, 1, cross_dim,
                                 norm_groups=groups)])
        self.temp_attentions = nn.ModuleList(
            [TransformerTemporalModelT(heads, head_dim, channels, 1, groups)])

    def forward(self, x, temb, context, num_frames):
        x = self.temp_convs[0](self.resnets[0](x, temb), num_frames)
        x = self.attentions[0](x, context)
        x = self.temp_attentions[0](x, num_frames)
        return self.temp_convs[1](self.resnets[1](x, temb), num_frames)


class UpBlock3DT(nn.Module):
    def __init__(self, cin, prev_out, cout, temb, num_layers=3, groups=32,
                 add_upsample=True):
        super().__init__()
        resnets, temp_convs = [], []
        for i in range(num_layers):
            skip = cin if i == num_layers - 1 else cout
            rin = prev_out if i == 0 else cout
            resnets.append(ResnetBlock2DT(rin + skip, cout, temb, groups))
            temp_convs.append(TemporalConvLayerT(cout, cout, groups))
        self.resnets = nn.ModuleList(resnets)
        self.temp_convs = nn.ModuleList(temp_convs)
        self.upsamplers = nn.ModuleList([Upsample2DT(cout)]) if add_upsample else None

    def forward(self, x, skips, temb, num_frames):
        for resnet, tconv in zip(self.resnets, self.temp_convs):
            x = torch.cat([x, skips[-1]], dim=1)
            skips = skips[:-1]
            x = tconv(resnet(x, temb), num_frames)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class CrossAttnUpBlock3DT(nn.Module):
    def __init__(self, cin, prev_out, cout, temb, head_dim, cross_dim,
                 num_layers=3, groups=32, add_upsample=True):
        super().__init__()
        heads = cout // head_dim
        resnets, temp_convs, attentions, temp_attentions = [], [], [], []
        for i in range(num_layers):
            skip = cin if i == num_layers - 1 else cout
            rin = prev_out if i == 0 else cout
            resnets.append(ResnetBlock2DT(rin + skip, cout, temb, groups))
            temp_convs.append(TemporalConvLayerT(cout, cout, groups))
            attentions.append(Transformer2DModelT(heads, head_dim, cout, 1,
                                                  cross_dim, norm_groups=groups))
            temp_attentions.append(
                TransformerTemporalModelT(heads, head_dim, cout, 1, groups))
        self.resnets = nn.ModuleList(resnets)
        self.temp_convs = nn.ModuleList(temp_convs)
        self.attentions = nn.ModuleList(attentions)
        self.temp_attentions = nn.ModuleList(temp_attentions)
        self.upsamplers = nn.ModuleList([Upsample2DT(cout)]) if add_upsample else None

    def forward(self, x, skips, temb, context, num_frames):
        for resnet, tconv, attn, tattn in zip(
                self.resnets, self.temp_convs, self.attentions, self.temp_attentions):
            x = torch.cat([x, skips[-1]], dim=1)
            skips = skips[:-1]
            x = tconv(resnet(x, temb), num_frames)
            x = attn(x, context)
            x = tattn(x, num_frames)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class I2VGenXLUNetT(nn.Module):
    """Reference-fork I2VGenXLUNet semantics (`unet_i2vgen_xl.py:530-714`) at a
    thin config, incl. residual injection."""

    def __init__(self, block_out=(32, 32, 32, 32), head_dim=16, cross_dim=24,
                 layers_per_block=1, groups=32, in_channels=4):
        super().__init__()
        time_dim = block_out[0] * 4
        self.block_out = block_out
        self.cross_dim = cross_dim
        self.in_ch = in_channels
        self.conv_in = nn.Conv2d(in_channels * 2, block_out[0], 3, padding=1)
        self.transformer_in = TransformerTemporalModelT(8, head_dim, block_out[0],
                                                        1, groups)
        self.image_latents_proj_in = nn.Sequential(
            nn.Conv2d(4, in_channels * 4, 3, padding=1), nn.SiLU(),
            nn.Conv2d(in_channels * 4, in_channels * 4, 3, padding=1), nn.SiLU(),
            nn.Conv2d(in_channels * 4, in_channels, 3, padding=1))
        self.image_latents_temporal_encoder = I2VGenXLTransformerTemporalEncoderT(
            in_channels, 2, in_channels, in_channels * 4)
        self.image_latents_context_embedding = nn.Sequential(
            nn.Conv2d(4, in_channels * 8, 3, padding=1), nn.SiLU(),
            nn.AdaptiveAvgPool2d((32, 32)),
            nn.Conv2d(in_channels * 8, in_channels * 16, 3, stride=2, padding=1),
            nn.SiLU(),
            nn.Conv2d(in_channels * 16, cross_dim, 3, stride=2, padding=1))
        self.time_embedding = TimestepEmbeddingT(block_out[0], time_dim)
        self.context_embedding = nn.Sequential(
            nn.Linear(cross_dim, time_dim), nn.SiLU(),
            nn.Linear(time_dim, cross_dim * in_channels))
        self.fps_embedding = nn.Sequential(
            nn.Linear(block_out[0], time_dim), nn.SiLU(),
            nn.Linear(time_dim, time_dim))

        down_blocks = []
        out_ch = block_out[0]
        n = len(block_out)
        for i in range(n):
            in_ch, out_ch = out_ch, block_out[i]
            final = i == n - 1
            if not final:
                down_blocks.append(CrossAttnDownBlock3DT(
                    in_ch, out_ch, time_dim, head_dim, cross_dim, layers_per_block,
                    groups, True))
            else:
                down_blocks.append(DownBlock3DT(
                    in_ch, out_ch, time_dim, layers_per_block, groups, False))
        self.down_blocks = nn.ModuleList(down_blocks)
        self.mid_block = UNetMidBlock3DCrossAttnT(
            block_out[-1], time_dim, head_dim, cross_dim, groups)
        up_blocks = []
        rev = list(reversed(block_out))
        out_ch = rev[0]
        for i in range(n):
            prev_out, out_ch = out_ch, rev[i]
            in_ch = rev[min(i + 1, n - 1)]
            final = i == n - 1
            if i == 0:
                up_blocks.append(UpBlock3DT(
                    in_ch, prev_out, out_ch, time_dim, layers_per_block + 1,
                    groups, not final))
            else:
                up_blocks.append(CrossAttnUpBlock3DT(
                    in_ch, prev_out, out_ch, time_dim, head_dim, cross_dim,
                    layers_per_block + 1, groups, not final))
        self.up_blocks = nn.ModuleList(up_blocks)
        self.conv_norm_out = nn.GroupNorm(groups, block_out[0], eps=1e-5)
        self.conv_out = nn.Conv2d(block_out[0], 4, 3, padding=1)

    def forward(self, sample, timesteps, fps, image_latents, image_embeddings,
                encoder_hidden_states, down_block_additional_residuals=None,
                mid_block_additional_residual=None):
        b, c, num_frames, height, width = sample.shape
        t_emb = self.time_embedding(timestep_embedding(timesteps, self.block_out[0]))
        fps_emb = self.fps_embedding(timestep_embedding(fps, self.block_out[0]))
        emb = (t_emb + fps_emb).repeat_interleave(num_frames, dim=0)

        context = encoder_hidden_states
        il_context = self.image_latents_context_embedding(image_latents[:, :, 0])
        il_context = il_context.permute(0, 2, 3, 1).reshape(b, -1, self.cross_dim)
        context = torch.cat([context, il_context], dim=1)
        ie = self.context_embedding(image_embeddings)
        ie = ie.reshape(b, self.in_ch, self.cross_dim)
        context = torch.cat([context, ie], dim=1)
        context = context.repeat_interleave(num_frames, dim=0)

        il = image_latents.permute(0, 2, 1, 3, 4).reshape(b * num_frames, c, height, width)
        il = self.image_latents_proj_in(il)
        il = il.reshape(b, num_frames, c, height, width).permute(0, 3, 4, 1, 2)
        il = il.reshape(b * height * width, num_frames, c)
        il = self.image_latents_temporal_encoder(il)
        il = il.reshape(b, height, width, num_frames, c).permute(0, 4, 3, 1, 2)

        sample = torch.cat([sample, il], dim=1)
        sample = sample.permute(0, 2, 1, 3, 4).reshape(b * num_frames, 2 * c, height, width)
        sample = self.conv_in(sample)
        sample = self.transformer_in(sample, num_frames)

        skips = (sample,)
        for block in self.down_blocks:
            if isinstance(block, CrossAttnDownBlock3DT):
                sample, res = block(sample, emb, context, num_frames)
            else:
                sample, res = block(sample, emb, num_frames)
            skips += res
        if down_block_additional_residuals is not None:
            skips = tuple(s + r for s, r in zip(skips, down_block_additional_residuals))
        sample = self.mid_block(sample, emb, context, num_frames)
        if mid_block_additional_residual is not None:
            sample = sample + mid_block_additional_residual
        n_layers = len(self.down_blocks[0].resnets) + 1
        for block in self.up_blocks:
            res_samples, skips = skips[-n_layers:], skips[:-n_layers]
            if isinstance(block, CrossAttnUpBlock3DT):
                sample = block(sample, res_samples, emb, context, num_frames)
            else:
                sample = block(sample, res_samples, emb, num_frames)
        sample = self.conv_out(F.silu(self.conv_norm_out(sample)))
        return sample.reshape(b, num_frames, 4, height, width).permute(0, 2, 1, 3, 4)


# ----------------------------------------------------- SwinV2 / MiDaS DPT-swin
class SwinV2WindowAttentionT(nn.Module):
    """timm swin_transformer_v2 WindowAttention: cosine attention + cpb MLP."""

    def __init__(self, dim, window, num_heads, pretrained_window=0):
        super().__init__()
        self.dim, self.window, self.num_heads = dim, window, num_heads
        self.logit_scale = nn.Parameter(
            torch.log(10 * torch.ones((num_heads, 1, 1))))
        self.cpb_mlp = nn.Sequential(
            nn.Linear(2, 512, bias=True), nn.ReLU(inplace=True),
            nn.Linear(512, num_heads, bias=False))
        coords = torch.arange(-(window - 1), window, dtype=torch.float32)
        table = torch.stack(torch.meshgrid(coords, coords, indexing="ij"),
                            dim=-1)[None]
        denom = (pretrained_window - 1) if pretrained_window > 0 else (window - 1)
        table = table / max(denom, 1) * 8
        table = torch.sign(table) * torch.log2(table.abs() + 1.0) / math.log2(8)
        self.register_buffer("relative_coords_table", table)
        c = torch.stack(torch.meshgrid(torch.arange(window), torch.arange(window),
                                       indexing="ij")).flatten(1)
        rel = (c[:, :, None] - c[:, None, :]).permute(1, 2, 0)
        rel[:, :, 0] += window - 1
        rel[:, :, 1] += window - 1
        rel[:, :, 0] *= 2 * window - 1
        self.register_buffer("relative_position_index", rel.sum(-1))
        self.qkv = nn.Linear(dim, 3 * dim, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(dim))
        self.v_bias = nn.Parameter(torch.zeros(dim))
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        qkv_bias = torch.cat((self.q_bias, torch.zeros_like(self.v_bias),
                              self.v_bias))
        qkv = F.linear(x, self.qkv.weight, qkv_bias)
        qkv = qkv.reshape(B_, N, 3, self.num_heads, -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(-2, -1)
        logit_scale = torch.clamp(self.logit_scale,
                                  max=math.log(1.0 / 0.01)).exp()
        attn = attn * logit_scale
        bias_table = self.cpb_mlp(self.relative_coords_table).view(-1, self.num_heads)
        bias = bias_table[self.relative_position_index.view(-1)].view(
            N, N, self.num_heads).permute(2, 0, 1)
        attn = attn + 16 * torch.sigmoid(bias)[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, self.num_heads, N, N) + \
                mask[None, :, None]
            attn = attn.view(B_, self.num_heads, N, N)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(x)


def _swin_window_partition(x, window):
    B, H, W, C = x.shape
    x = x.view(B, H // window, window, W // window, window, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, window * window, C)


def _swin_window_reverse(x, window, H, W):
    B = x.shape[0] // ((H // window) * (W // window))
    x = x.view(B, H // window, W // window, window, window, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


class SwinV2BlockT(nn.Module):
    def __init__(self, dim, resolution, num_heads, window, shift,
                 pretrained_window=0, mlp_ratio=4.0):
        super().__init__()
        self.dim, self.resolution = dim, resolution
        self.window, self.shift = window, shift
        self.attn = SwinV2WindowAttentionT(dim, window, num_heads,
                                           pretrained_window)
        self.norm1 = nn.LayerNorm(dim)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.fc2 = nn.Linear(int(dim * mlp_ratio), dim)
        self.norm2 = nn.LayerNorm(dim)
        if shift > 0:
            H = W = resolution
            img_mask = torch.zeros((1, H, W, 1))
            cnt = 0
            for hs in (slice(0, -window), slice(-window, -shift),
                       slice(-shift, None)):
                for ws in (slice(0, -window), slice(-window, -shift),
                           slice(-shift, None)):
                    img_mask[:, hs, ws, :] = cnt
                    cnt += 1
            mw = _swin_window_partition(img_mask, window).squeeze(-1)
            diff = mw.unsqueeze(1) - mw.unsqueeze(2)
            self.register_buffer(
                "attn_mask", torch.where(diff != 0,
                                         torch.tensor(-100.0),
                                         torch.tensor(0.0)))
        else:
            self.attn_mask = None

    def forward(self, x):
        H = W = self.resolution
        B, L, C = x.shape
        shortcut = x
        xg = x.view(B, H, W, C)
        if self.shift > 0:
            xg = torch.roll(xg, (-self.shift, -self.shift), dims=(1, 2))
        windows = _swin_window_partition(xg, self.window)
        attn = self.attn(windows, self.attn_mask)
        xg = _swin_window_reverse(attn, self.window, H, W)
        if self.shift > 0:
            xg = torch.roll(xg, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + self.norm1(xg.reshape(B, L, C))
        x = x + self.norm2(self.mlp.fc2(F.gelu(self.mlp.fc1(x))))
        return x


class SwinV2PatchMergingT(nn.Module):
    def __init__(self, dim, resolution):
        super().__init__()
        self.dim, self.resolution = dim, resolution
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(2 * dim)

    def forward(self, x):
        H = W = self.resolution
        B, L, C = x.shape
        xg = x.view(B, H, W, C)
        x0 = xg[:, 0::2, 0::2]
        x1 = xg[:, 1::2, 0::2]
        x2 = xg[:, 0::2, 1::2]
        x3 = xg[:, 1::2, 1::2]
        xg = torch.cat([x0, x1, x2, x3], -1).view(B, -1, 4 * C)
        return self.norm(self.reduction(xg))


class SwinV2StageT(nn.Module):
    def __init__(self, dim, depth, resolution, num_heads, window,
                 pretrained_window, downsample):
        super().__init__()
        ws = min(window, resolution)
        blocks = []
        for j in range(depth):
            shift = 0 if (j % 2 == 0 or resolution <= ws) else ws // 2
            blocks.append(SwinV2BlockT(dim, resolution, num_heads, ws, shift,
                                       pretrained_window))
        self.blocks = nn.ModuleList(blocks)
        self.downsample = (SwinV2PatchMergingT(dim, resolution)
                           if downsample else None)

    def forward(self, x):
        for block in self.blocks:
            x = block(x)
        feature = x
        if self.downsample is not None:
            x = self.downsample(x)
        return x, feature


class SwinV2T(nn.Module):
    """timm swin_transformer_v2 semantics (0.6.x sequence layout, the version
    the vendored MiDaS hooks assume); returns per-stage features (B, L, C)."""

    def __init__(self, img_size=64, patch_size=4, embed_dim=16,
                 depths=(1, 2, 2, 1), num_heads=(2, 2, 4, 4), window=4,
                 pretrained_windows=(2, 2, 2, 2)):
        super().__init__()
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, embed_dim, patch_size, patch_size)
        self.patch_embed.norm = nn.LayerNorm(embed_dim)
        grid = img_size // patch_size
        layers = []
        dim, res = embed_dim, grid
        for i, depth in enumerate(depths):
            layers.append(SwinV2StageT(dim, depth, res, num_heads[i], window,
                                       pretrained_windows[i],
                                       i < len(depths) - 1))
            if i < len(depths) - 1:
                dim *= 2
                res //= 2
        self.layers = nn.ModuleList(layers)

    def forward(self, x):
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = self.patch_embed.norm(x)
        features = []
        for layer in self.layers:
            x, feature = layer(x)
            features.append(feature)
        return features


class _MidasResidualConvUnitT(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.conv1 = nn.Conv2d(features, features, 3, padding=1)
        self.conv2 = nn.Conv2d(features, features, 3, padding=1)

    def forward(self, x):
        out = self.conv2(F.relu(self.conv1(F.relu(x))))
        return out + x


class _MidasFusionBlockT(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.out_conv = nn.Conv2d(features, features, 1)
        self.resConfUnit1 = _MidasResidualConvUnitT(features)
        self.resConfUnit2 = _MidasResidualConvUnitT(features)

    def forward(self, x, skip=None, size=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        kwargs = {"scale_factor": 2} if size is None else {"size": size}
        x = F.interpolate(x, mode="bilinear", align_corners=True, **kwargs)
        return self.out_conv(x)


class DPTSwinT(nn.Module):
    """MiDaS DPTDepthModel with swin backbone at thin config; state-dict keys
    match the real ``dpt_swin2_large_384.pt`` layout (pretrained.model.* +
    scratch.*)."""

    def __init__(self, features=32, **swin_kwargs):
        super().__init__()
        self.pretrained = nn.Module()
        self.pretrained.model = SwinV2T(**swin_kwargs)
        embed = self.pretrained.model.patch_embed.proj.out_channels
        grid = swin_kwargs.get("img_size", 64) // swin_kwargs.get("patch_size", 4)
        self.grids = [grid, grid // 2, grid // 4, grid // 8]
        dims = [embed, embed * 2, embed * 4, embed * 8]
        self.scratch = nn.Module()
        for i, d in enumerate(dims):
            setattr(self.scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(d, features, 3, padding=1, bias=False))
        self.scratch.refinenet1 = _MidasFusionBlockT(features)
        self.scratch.refinenet2 = _MidasFusionBlockT(features)
        self.scratch.refinenet3 = _MidasFusionBlockT(features)
        self.scratch.refinenet4 = _MidasFusionBlockT(features)
        self.scratch.output_conv = nn.Sequential(
            nn.Conv2d(features, features // 2, 3, padding=1),
            nn.Identity(),  # Interpolate module (no params)
            nn.Conv2d(features // 2, 32, 3, padding=1),
            nn.ReLU(True),
            nn.Conv2d(32, 1, 1),
            nn.ReLU(True),
            nn.Identity(),
        )

    def forward(self, x):
        feats = self.pretrained.model(x)
        grids = []
        for f, g in zip(feats, self.grids):
            grids.append(f.transpose(1, 2).unflatten(2, (g, g)))
        l1 = self.scratch.layer1_rn(grids[0])
        l2 = self.scratch.layer2_rn(grids[1])
        l3 = self.scratch.layer3_rn(grids[2])
        l4 = self.scratch.layer4_rn(grids[3])
        p4 = self.scratch.refinenet4(l4, size=l3.shape[2:])
        p3 = self.scratch.refinenet3(p4, l3, size=l2.shape[2:])
        p2 = self.scratch.refinenet2(p3, l2, size=l1.shape[2:])
        p1 = self.scratch.refinenet1(p2, l1)
        x = self.scratch.output_conv[0](p1)
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        for m in self.scratch.output_conv[2:]:
            x = m(x)
        return x.squeeze(1)


# ----------------------------------------------- Ctrl-Adapter core mirrors
# Torch mirrors of the trainable core, matching the reference module tree
# (`model/adapter_spatial_temporal.py`, `model/ctrl_adapter.py`,
# `model/ctrl_router.py`) so their state_dicts carry the SAME keys a released
# checkpoint has — used by the file-level release-loading roundtrip test.


class AdapterResnetBlock2DT(nn.Module):
    """Reference fork `model/resnet_block_2d.py` as the adapter instantiates it:
    ``use_in_shortcut=True`` (1x1 shortcut even at cin==cout), eps=1e-6, no up."""

    def __init__(self, cin, cout, temb, eps=1e-6):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb, cout)
        self.norm2 = nn.GroupNorm(32, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x, temb, output_size=None):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        return self.conv_shortcut(x) + h


class AdapterSpatioTemporalT(nn.Module):
    """Mirror of reference `model/adapter_spatial_temporal.py` with every module
    enabled (spatial/temporal resnets + transformers + both AlphaBlenders)."""

    def __init__(self, in_channels, out_channels, num_layers=1,
                 cross_attention_dim=1024, num_attention_heads=8,
                 attention_head_dim=64):
        super().__init__()
        self.num_layers = num_layers
        self.in_channels = in_channels
        inner = num_attention_heads * attention_head_dim  # bug-compatible inner_dim
        heads = in_channels // attention_head_dim
        self.resnet_time_embedding = TimestepEmbeddingT(in_channels, in_channels)
        self.norm = nn.GroupNorm(32, in_channels, eps=1e-6)
        self.transformer_time_embedding = TimestepEmbeddingT(in_channels, inner)
        self.proj_in = nn.Linear(in_channels, inner)
        self.proj_out = nn.Linear(inner, in_channels)
        self.spatial_resnets = nn.ModuleList(
            [AdapterResnetBlock2DT(in_channels, out_channels, in_channels)
             for _ in range(num_layers)])
        self.temporal_resnets = nn.ModuleList(
            [TemporalResnetBlockT(out_channels, out_channels, in_channels, eps=1e-6)
             for _ in range(num_layers)])
        self.spatial_attentions = nn.ModuleList(
            [BasicTransformerBlockT(inner, heads, attention_head_dim,
                                    cross_attention_dim)
             for _ in range(num_layers)])
        self.temporal_attentions = nn.ModuleList(
            [TemporalBasicTransformerBlockT(inner, inner, heads, attention_head_dim,
                                            cross_attention_dim)
             for _ in range(num_layers)])
        self.resnets_time_mixer = nn.ModuleList(
            [AlphaBlenderT(0.5) for _ in range(num_layers)])
        self.transformers_time_mixer = nn.ModuleList(
            [AlphaBlenderT(0.5) for _ in range(num_layers)])

    def forward(self, x, num_frames, timestep, encoder_hidden_states):
        bf, c, h, w = x.shape
        b = bf // num_frames
        timestep = timestep.reshape(-1)
        if timestep.shape[0] != bf:
            timestep = timestep.repeat_interleave(bf // timestep.shape[0], dim=0)
        ioi = torch.zeros(b, num_frames)
        ehs = encoder_hidden_states
        if ehs.dim() == 2:
            ehs = ehs.unsqueeze(1)
        if ehs.shape[0] == 1:
            ehs = ehs.repeat_interleave(bf, dim=0)
        for i in range(self.num_layers):
            temb = self.resnet_time_embedding(
                timestep_embedding(timestep, c, True, 0.0))
            x = self.spatial_resnets[i](x, temb)
            x_mix = x.reshape(b, num_frames, c, h, w).permute(0, 2, 1, 3, 4)
            x5 = self.temporal_resnets[i](x_mix, temb.reshape(b, num_frames, -1))
            x5 = self.resnets_time_mixer[i](
                x_spatial=x_mix, x_temporal=x5, image_only_indicator=ioi)
            x = x5.permute(0, 2, 1, 3, 4).reshape(bf, c, h, w)

            tc_first = ehs[None, :].reshape(b, num_frames, -1, ehs.shape[-1])[:, 0]
            time_context = tc_first[None, :].broadcast_to(
                h * w, b, tc_first.shape[1], ehs.shape[-1]
            ).reshape(h * w * b, -1, ehs.shape[-1])
            residual = x
            xs = self.norm(x).permute(0, 2, 3, 1).reshape(bf, h * w, c)
            xs = self.proj_in(xs)
            frame_idx = torch.arange(num_frames).repeat(b, 1).reshape(-1)
            emb = self.transformer_time_embedding(
                timestep_embedding(frame_idx.float(), self.in_channels, True, 0.0)
            )[:, None, :]
            xs = self.spatial_attentions[i](xs, ehs)
            xs_mix = xs
            xs = self.temporal_attentions[i](xs + emb, num_frames, time_context)
            xs = self.transformers_time_mixer[i](
                x_spatial=xs_mix, x_temporal=xs, image_only_indicator=ioi)
            xs = self.proj_out(xs)
            x = xs.reshape(bf, h, w, c).permute(0, 3, 1, 2) + residual
        return x


class ControlNetAdapterT(nn.Module):
    """Mirror of reference `model/ctrl_adapter.py`: ``down_blocks_adapter``
    ModuleList over the active slots + ``mid_block_adapter``."""

    def __init__(self, down_channels, mid_channels, **block_kwargs):
        super().__init__()
        self.down_blocks_adapter = nn.ModuleList(
            [AdapterSpatioTemporalT(ch, ch, **block_kwargs) for ch in down_channels])
        self.mid_block_adapter = AdapterSpatioTemporalT(
            mid_channels, mid_channels, **block_kwargs)

    def forward(self, downs, mid, num_frames, timestep, ehs, down_block_ids):
        outs, idx = [], 0
        for i, d in enumerate(downs):
            if i in down_block_ids:
                outs.append(self.down_blocks_adapter[idx](d, num_frames, timestep, ehs))
                idx += 1
            else:
                outs.append(torch.zeros_like(d))
        return outs, self.mid_block_adapter(mid, num_frames, timestep, ehs)


class SimpleWeightsT(nn.Module):
    """Reference `model/ctrl_router.py:26-40`: Linear(1, E, bias=False) on 1.0."""

    def __init__(self, num_experts):
        super().__init__()
        self.wg = nn.Linear(1, num_experts, bias=False)

    def forward(self):
        return self.wg(torch.ones(1, 1))


class ControlNetRouterT(nn.Module):
    def __init__(self, num_experts, num_routers=12, add_mid_block_router=True):
        super().__init__()
        self.down_blocks_router = nn.ModuleList(
            [SimpleWeightsT(num_experts) for _ in range(num_routers)])
        self.mid_block_router = (
            SimpleWeightsT(num_experts) if add_mid_block_router else None)

    def forward(self, sparse_mask=None):
        down_logits = torch.cat([r() for r in self.down_blocks_router])  # (R, E)
        mid_logits = self.mid_block_router()[0] if self.mid_block_router else None
        if sparse_mask is not None:
            penalty = (1.0 - sparse_mask) * 1.0e6
            down_logits = down_logits - penalty[None, :]
            if mid_logits is not None:
                mid_logits = mid_logits - penalty
        down_w = torch.softmax(down_logits, dim=-1)
        mid_w = torch.softmax(mid_logits, dim=-1) if mid_logits is not None else None
        return down_w, mid_w
