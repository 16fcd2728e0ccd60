"""Minimal PyTorch implementation of the LDM/SD UNet + ControlNet block
structure, used ONLY as a test oracle for the checkpoint converter.

This is written from the SD1.5 architecture spec (GroupNorm32→SiLU→conv
res blocks with timestep-embedding injection, pre-LN transformer blocks with
GEGLU feed-forward, conv 1x1 spatial-transformer projections, stride-8 hint
CNN + zero convs) so that `state_dict()` keys/layouts match the reference
checkpoint format (see convert/torch_convert.py docstring). It is NOT copied
from /root/reference — it exists to prove that loading a torch checkpoint
into the Flax modules reproduces the torch forward numerically.
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t, dim, max_period=10000):
    half = dim // 2
    freqs = torch.exp(-math.log(max_period) * torch.arange(half).float() / half)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class ResBlock(nn.Module):
    def __init__(self, in_ch, out_ch, emb_ch):
        super().__init__()
        self.in_layers = nn.Sequential(
            nn.GroupNorm(32 if in_ch % 32 == 0 else math.gcd(in_ch, 32), in_ch),
            nn.SiLU(),
            nn.Conv2d(in_ch, out_ch, 3, padding=1),
        )
        self.emb_layers = nn.Sequential(nn.SiLU(), nn.Linear(emb_ch, out_ch))
        self.out_layers = nn.Sequential(
            nn.GroupNorm(32 if out_ch % 32 == 0 else math.gcd(out_ch, 32), out_ch),
            nn.SiLU(),
            nn.Dropout(0.0),
            nn.Conv2d(out_ch, out_ch, 3, padding=1),
        )
        self.skip_connection = (
            nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else nn.Identity()
        )

    def forward(self, x, emb):
        h = self.in_layers(x)
        h = h + self.emb_layers(emb)[:, :, None, None]
        h = self.out_layers(h)
        return self.skip_connection(x) + h


class CrossAttention(nn.Module):
    def __init__(self, query_dim, context_dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.scale = dim_head**-0.5
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(context_dim, inner, bias=False)
        self.to_v = nn.Linear(context_dim, inner, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, query_dim), nn.Dropout(0.0))

    def forward(self, x, context=None):
        context = x if context is None else context
        q, k, v = self.to_q(x), self.to_k(context), self.to_v(context)
        b, n, _ = q.shape
        m = k.shape[1]

        def split(t, L):
            return t.view(b, L, self.heads, self.dim_head).transpose(1, 2)

        q, k, v = split(q, n), split(k, m), split(v, m)
        attn = (q @ k.transpose(-1, -2)) * self.scale
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, -1)
        return self.to_out(out)


class GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        self.net = nn.Sequential(GEGLU(dim, dim * mult), nn.Dropout(0.0),
                                 nn.Linear(dim * mult, dim))

    def forward(self, x):
        return self.net(x)


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, context_dim, heads, dim_head):
        super().__init__()
        self.attn1 = CrossAttention(dim, dim, heads, dim_head)
        self.attn2 = CrossAttention(dim, context_dim, heads, dim_head)
        self.ff = FeedForward(dim)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)

    def forward(self, x, context, bank=None, collect=None):
        h = self.norm1(x)
        if collect is not None:
            collect.append(h)
        if bank is not None:
            ctx1 = torch.cat([h] + [bank], dim=1)
            x = self.attn1(h, ctx1) + x
        else:
            x = self.attn1(h) + x
        x = self.attn2(self.norm2(x), context) + x
        x = self.ff(self.norm3(x)) + x
        return x


class SpatialTransformer(nn.Module):
    def __init__(self, ch, context_dim, heads, dim_head, depth=1):
        super().__init__()
        self.norm = nn.GroupNorm(32 if ch % 32 == 0 else math.gcd(ch, 32), ch,
                                 eps=1e-6)
        inner = heads * dim_head
        self.proj_in = nn.Conv2d(ch, inner, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(inner, context_dim, heads, dim_head)
             for _ in range(depth)]
        )
        self.proj_out = nn.Conv2d(inner, ch, 1)

    def forward(self, x, context, bank_entries=None, collect=None):
        b, c, h, w = x.shape
        res = x
        z = self.proj_in(self.norm(x))
        z = z.permute(0, 2, 3, 1).reshape(b, h * w, -1)
        for i, blk in enumerate(self.transformer_blocks):
            entry = bank_entries[i] if bank_entries is not None else None
            z = blk(z, context, bank=entry, collect=collect)
        z = z.reshape(b, h, w, -1).permute(0, 3, 1, 2)
        return res + self.proj_out(z)


class Downsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.op = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.op(x)


class Upsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class TorchUNet(nn.Module):
    """Key-compatible mini SD UNet ('model.diffusion_model.*' layout)."""

    def __init__(self, model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                 attention_resolutions=(1, 2), heads=2, context_dim=16,
                 in_channels=4, out_channels=4):
        super().__init__()
        self.cfgs = (model_channels, channel_mult, num_res_blocks,
                     attention_resolutions, heads)
        emb = model_channels * 4
        self.time_embed = nn.Sequential(
            nn.Linear(model_channels, emb), nn.SiLU(), nn.Linear(emb, emb)
        )
        self.model_channels = model_channels

        self.input_blocks = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(in_channels, model_channels, 3, padding=1))]
        )
        self._plan = []  # mirrors magicdance unet_plan for forward()
        ch = model_channels
        ds = 1
        for level, mult in enumerate(channel_mult):
            out_ch = model_channels * mult
            for _ in range(num_res_blocks):
                mods = [ResBlock(ch, out_ch, emb)]
                attn = ds in attention_resolutions
                if attn:
                    mods.append(SpatialTransformer(out_ch, context_dim, heads,
                                                   out_ch // heads))
                self.input_blocks.append(nn.Sequential(*mods))
                self._plan.append(("res", attn))
                ch = out_ch
            if level != len(channel_mult) - 1:
                self.input_blocks.append(nn.Sequential(Downsample(ch)))
                self._plan.append(("down", False))
                ds *= 2

        self.middle_block = nn.Sequential(
            ResBlock(ch, ch, emb),
            SpatialTransformer(ch, context_dim, heads, ch // heads),
            ResBlock(ch, ch, emb),
        )

        self.output_blocks = nn.ModuleList()
        self._out_plan = []
        skip_ch = [model_channels]
        c2 = model_channels
        for level, mult in enumerate(channel_mult):
            for _ in range(num_res_blocks):
                c2 = model_channels * mult
                skip_ch.append(c2)
            if level != len(channel_mult) - 1:
                skip_ch.append(c2)
        for level in reversed(range(len(channel_mult))):
            out_ch = model_channels * channel_mult[level]
            for i in range(num_res_blocks + 1):
                sc = skip_ch.pop()
                mods = [ResBlock(ch + sc, out_ch, emb)]
                attn = ds in attention_resolutions
                if attn:
                    mods.append(SpatialTransformer(out_ch, context_dim, heads,
                                                   out_ch // heads))
                up = level != 0 and i == num_res_blocks
                if up:
                    mods.append(Upsample(out_ch))
                    ds //= 2
                self.output_blocks.append(nn.Sequential(*mods))
                self._out_plan.append((attn, up))
                ch = out_ch

        g = 32 if ch % 32 == 0 else math.gcd(ch, 32)
        self.out = nn.Sequential(nn.GroupNorm(g, ch), nn.SiLU(),
                                 nn.Conv2d(ch, out_channels, 3, padding=1))

    def forward(self, x, t, context, bank=None, collect_bank=False,
                pose_residuals=None):
        collect = [] if collect_bank else None
        bank = list(bank) if bank is not None else None
        emb = self.time_embed(timestep_embedding(t, self.model_channels))
        h = self.input_blocks[0](x)
        hs = [h]
        for i, (kind, attn) in enumerate(self._plan):
            block = self.input_blocks[i + 1]
            if kind == "res":
                h = block[0](h, emb)
                if attn:
                    entry = [bank.pop(0)] if bank is not None else None
                    h = block[1](h, context, bank_entries=entry, collect=collect)
            else:
                h = block[0](h)
            hs.append(h)
        h = self.middle_block[0](h, emb)
        entry = [bank.pop(0)] if bank is not None else None
        h = self.middle_block[1](h, context, bank_entries=entry, collect=collect)
        h = self.middle_block[2](h, emb)
        if pose_residuals is not None:
            h = h + pose_residuals[-1]
        for i, (attn, up) in enumerate(self._out_plan):
            block = self.output_blocks[i]
            skip = hs.pop()
            if pose_residuals is not None:
                skip = skip + pose_residuals[len(hs)]
            h = torch.cat([h, skip], dim=1)
            h = block[0](h, emb)
            j = 1
            if attn:
                entry = [bank.pop(0)] if bank is not None else None
                h = block[j](h, context, bank_entries=entry, collect=collect)
                j += 1
            if up:
                h = block[j](h)
        out = self.out(h)
        if collect_bank:
            return out, collect
        return out


class TorchControlNet(nn.Module):
    """Key-compatible mini pose ControlNet ('control_model.*' layout)."""

    def __init__(self, model_channels=32, channel_mult=(1, 2), num_res_blocks=1,
                 attention_resolutions=(1, 2), heads=2, context_dim=16,
                 hint_channels=3, in_channels=4):
        super().__init__()
        emb = model_channels * 4
        self.model_channels = model_channels
        self.time_embed = nn.Sequential(
            nn.Linear(model_channels, emb), nn.SiLU(), nn.Linear(emb, emb)
        )
        widths = [16, 16, 32, 32, 96, 96, 256]
        strides = [1, 1, 2, 1, 2, 1, 2]
        layers = []
        cin = hint_channels
        for w, s in zip(widths, strides):
            layers += [nn.Conv2d(cin, w, 3, padding=1, stride=s), nn.SiLU()]
            cin = w
        layers.append(nn.Conv2d(cin, model_channels, 3, padding=1))
        self.input_hint_block = nn.Sequential(*layers)

        self.input_blocks = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(in_channels, model_channels, 3, padding=1))]
        )
        self.zero_convs = nn.ModuleList(
            [nn.Sequential(nn.Conv2d(model_channels, model_channels, 1))]
        )
        self._plan = []
        ch = model_channels
        ds = 1
        for level, mult in enumerate(channel_mult):
            out_ch = model_channels * mult
            for _ in range(num_res_blocks):
                mods = [ResBlock(ch, out_ch, emb)]
                attn = ds in attention_resolutions
                if attn:
                    mods.append(SpatialTransformer(out_ch, context_dim, heads,
                                                   out_ch // heads))
                self.input_blocks.append(nn.Sequential(*mods))
                self.zero_convs.append(nn.Sequential(nn.Conv2d(out_ch, out_ch, 1)))
                self._plan.append(("res", attn))
                ch = out_ch
            if level != len(channel_mult) - 1:
                self.input_blocks.append(nn.Sequential(Downsample(ch)))
                self.zero_convs.append(nn.Sequential(nn.Conv2d(ch, ch, 1)))
                self._plan.append(("down", False))
                ds *= 2
        self.middle_block = nn.Sequential(
            ResBlock(ch, ch, emb),
            SpatialTransformer(ch, context_dim, heads, ch // heads),
            ResBlock(ch, ch, emb),
        )
        self.middle_block_out = nn.Sequential(nn.Conv2d(ch, ch, 1))

    def forward(self, x, hint, t, context):
        emb = self.time_embed(timestep_embedding(t, self.model_channels))
        guided = self.input_hint_block(hint)
        h = self.input_blocks[0](x) + guided
        outs = [self.zero_convs[0](h)]
        for i, (kind, attn) in enumerate(self._plan):
            block = self.input_blocks[i + 1]
            if kind == "res":
                h = block[0](h, emb)
                if attn:
                    h = block[1](h, context)
            else:
                h = block[0](h)
            outs.append(self.zero_convs[i + 1](h))
        h = self.middle_block[0](h, emb)
        h = self.middle_block[1](h, context)
        h = self.middle_block[2](h, emb)
        outs.append(self.middle_block_out(h))
        return outs


# ---------------------------------------------------------------------------
# VAE oracle ('first_stage_model.*' key layout)
# ---------------------------------------------------------------------------


class VAEResnetBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = nn.GroupNorm(32 if cin % 32 == 0 else math.gcd(cin, 32),
                                  cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(32 if cout % 32 == 0 else math.gcd(cout, 32),
                                  cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.nin_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "nin_shortcut"):
            x = self.nin_shortcut(x)
        return x + h


class VAEAttn(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = nn.GroupNorm(32 if c % 32 == 0 else math.gcd(c, 32), c,
                                 eps=1e-6)
        self.q = nn.Conv2d(c, c, 1)
        self.k = nn.Conv2d(c, c, 1)
        self.v = nn.Conv2d(c, c, 1)
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        z = self.norm(x)
        q = self.q(z).reshape(b, c, h * w).permute(0, 2, 1)
        k = self.k(z).reshape(b, c, h * w)
        v = self.v(z).reshape(b, c, h * w)
        attn = torch.softmax(torch.bmm(q, k) * (c ** -0.5), dim=-1)
        out = torch.bmm(v, attn.permute(0, 2, 1)).reshape(b, c, h, w)
        return x + self.proj_out(out)


class _Mid(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.block_1 = VAEResnetBlock(c, c)
        self.attn_1 = VAEAttn(c)
        self.block_2 = VAEResnetBlock(c, c)

    def forward(self, x):
        return self.block_2(self.attn_1(self.block_1(x)))


class _Down(nn.Module):
    def __init__(self, cin, cout, downsample):
        super().__init__()
        self.block = nn.ModuleList([VAEResnetBlock(cin, cout)])
        if downsample:
            self.downsample = _DownsampleV(cout)


class _DownsampleV(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class _Up(nn.Module):
    def __init__(self, cin, cout, n_blocks, upsample):
        super().__init__()
        blocks = []
        c = cin
        for _ in range(n_blocks):
            blocks.append(VAEResnetBlock(c, cout))
            c = cout
        self.block = nn.ModuleList(blocks)
        if upsample:
            self.upsample = _UpsampleV(cout)


class _UpsampleV(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class TorchVAE(nn.Module):
    """Key-compatible mini AutoencoderKL (num_res_blocks=1 variant)."""

    def __init__(self, base=32, mult=(1, 2), zc=4):
        super().__init__()
        levels = len(mult)

        class Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv_in = nn.Conv2d(3, base, 3, padding=1)
                downs = []
                cin = base
                for i, m in enumerate(mult):
                    cout = base * m
                    downs.append(_Down(cin, cout, downsample=i < levels - 1))
                    cin = cout
                self.down = nn.ModuleList(downs)
                self.mid = _Mid(cin)
                self.norm_out = nn.GroupNorm(32, cin, eps=1e-6)
                self.conv_out = nn.Conv2d(cin, 2 * zc, 3, padding=1)

            def forward(self, x):
                h = self.conv_in(x)
                for d in self.down:
                    for b in d.block:
                        h = b(h)
                    if hasattr(d, "downsample"):
                        h = d.downsample(h)
                h = self.mid(h)
                return self.conv_out(F.silu(self.norm_out(h)))

        class Dec(nn.Module):
            def __init__(self):
                super().__init__()
                ctop = base * mult[-1]
                self.conv_in = nn.Conv2d(zc, ctop, 3, padding=1)
                self.mid = _Mid(ctop)
                ups = [None] * levels
                cin = ctop
                for i in reversed(range(levels)):
                    cout = base * mult[i]
                    ups[i] = _Up(cin, cout, n_blocks=2, upsample=i != 0)
                    cin = cout
                self.up = nn.ModuleList(ups)
                self.norm_out = nn.GroupNorm(32, cin, eps=1e-6)
                self.conv_out = nn.Conv2d(cin, 3, 3, padding=1)

            def forward(self, z):
                h = self.mid(self.conv_in(z))
                for i in reversed(range(levels)):
                    for b in self.up[i].block:
                        h = b(h)
                    if hasattr(self.up[i], "upsample"):
                        h = self.up[i].upsample(h)
                return self.conv_out(F.silu(self.norm_out(h)))

        self.encoder = Enc()
        self.decoder = Dec()
        self.quant_conv = nn.Conv2d(2 * zc, 2 * zc, 1)
        self.post_quant_conv = nn.Conv2d(zc, zc, 1)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))


# ---------------------------------------------------------------------------
# AnimateDiff-style motion module oracle (state_dict keys match the public
# mm_sd_v15 layout that the reference's merge_state_dict_mm consumes,
# ref train_tiktok.py:146-192 / motion_module.py:86-331). Written from the
# AnimateDiff architecture spec; used only to test the converter.
# ---------------------------------------------------------------------------


class MotionPositionalEncoding(nn.Module):
    def __init__(self, d_model, max_len=24):
        super().__init__()
        position = torch.arange(max_len).unsqueeze(1)
        div_term = torch.exp(
            torch.arange(0, d_model, 2) * (-math.log(10000.0) / d_model))
        pe = torch.zeros(1, max_len, d_model)
        pe[0, :, 0::2] = torch.sin(position * div_term)
        pe[0, :, 1::2] = torch.cos(position * div_term)
        self.register_buffer("pe", pe)

    def forward(self, x):
        return x + self.pe[:, : x.size(1)]


class VersatileAttention(CrossAttention):
    """Temporal self-attention: (b f) d c -> (b d) f c, PE, attend over f."""

    def __init__(self, dim, heads, dim_head, max_len=24):
        super().__init__(dim, dim, heads, dim_head)
        self.pos_encoder = MotionPositionalEncoding(dim, max_len=max_len)

    def forward(self, x, video_length=None):
        bf, d, c = x.shape
        b = bf // video_length
        h = x.view(b, video_length, d, c).transpose(1, 2).reshape(
            b * d, video_length, c)
        h = self.pos_encoder(h)
        h = super().forward(h)
        return h.view(b, d, video_length, c).transpose(1, 2).reshape(bf, d, c)


class MotionTransformerBlock(nn.Module):
    def __init__(self, dim, heads, dim_head, attns=2, max_len=24):
        super().__init__()
        self.attention_blocks = nn.ModuleList(
            [VersatileAttention(dim, heads, dim_head, max_len)
             for _ in range(attns)])
        self.norms = nn.ModuleList(
            [nn.LayerNorm(dim) for _ in range(attns)])
        self.ff = FeedForward(dim)
        self.ff_norm = nn.LayerNorm(dim)

    def forward(self, x, video_length):
        for attn, norm in zip(self.attention_blocks, self.norms):
            x = attn(norm(x), video_length=video_length) + x
        return self.ff(self.ff_norm(x)) + x


class MotionTemporalTransformer(nn.Module):
    def __init__(self, c, heads, layers=1, attns=2, max_len=24):
        super().__init__()
        self.norm = nn.GroupNorm(32, c, eps=1e-6, affine=True)
        self.proj_in = nn.Linear(c, c)
        self.transformer_blocks = nn.ModuleList(
            [MotionTransformerBlock(c, heads, c // heads, attns, max_len)
             for _ in range(layers)])
        self.proj_out = nn.Linear(c, c)

    def forward(self, x, video_length):
        # x: (b f, c, h, w)
        bf, c, hh, ww = x.shape
        residual = x
        h = self.norm(x)
        h = h.permute(0, 2, 3, 1).reshape(bf, hh * ww, c)
        h = self.proj_in(h)
        for block in self.transformer_blocks:
            h = block(h, video_length)
        h = self.proj_out(h)
        h = h.reshape(bf, hh, ww, c).permute(0, 3, 1, 2)
        return h + residual


class TorchMotionModule(nn.Module):
    """VanillaTemporalModule equivalent: wraps the temporal transformer under
    the `temporal_transformer.` key prefix the checkpoints use."""

    def __init__(self, c, heads, layers=1, attns=2, max_len=24):
        super().__init__()
        self.temporal_transformer = MotionTemporalTransformer(
            c, heads, layers, attns, max_len)

    def forward(self, x, video_length):
        return self.temporal_transformer(x, video_length)


# ---------------------------------------------------------------------------
# Compact I3D oracle (Kinetics InceptionI3d layout: end_points named
# Conv3d_*/Mixed_* with Unit3D conv3d/bn children — the
# i3d_pretrained_400.pt key format FVD uses, ref tool/metrics/features.py).
# Written from the public DeepMind I3D spec; width-scalable for fast tests.
# ---------------------------------------------------------------------------


def _same_pad_3d(x, k, s):
    _, _, t, h, w = x.shape
    pads = []
    for dim, size in ((2, t), (3, h), (4, w)):
        i = dim - 2
        if size % s[i] == 0:
            p = max(k[i] - s[i], 0)
        else:
            p = max(k[i] - (size % s[i]), 0)
        pads.append((p // 2, p - p // 2))
    (tf, tb), (hf, hb), (wf, wb) = pads
    return F.pad(x, (wf, wb, hf, hb, tf, tb))


class I3DUnit(nn.Module):
    def __init__(self, cin, cout, k=(1, 1, 1), s=(1, 1, 1), bn=True,
                 act=True, bias=False):
        super().__init__()
        self.k, self.s, self.use_bn, self.act = k, s, bn, act
        self.conv3d = nn.Conv3d(cin, cout, k, s, padding=0, bias=bias)
        if bn:
            self.bn = nn.BatchNorm3d(cout, eps=0.001, momentum=0.01)

    def forward(self, x):
        x = self.conv3d(_same_pad_3d(x, self.k, self.s))
        if self.use_bn:
            x = self.bn(x)
        if self.act:
            x = F.relu(x)
        return x


def _same_maxpool_3d(x, k, s):
    return F.max_pool3d(_same_pad_3d(x, k, s), k, s)


class I3DMixed(nn.Module):
    def __init__(self, cin, ch):
        super().__init__()
        self.b0 = I3DUnit(cin, ch[0])
        self.b1a = I3DUnit(cin, ch[1])
        self.b1b = I3DUnit(ch[1], ch[2], (3, 3, 3))
        self.b2a = I3DUnit(cin, ch[3])
        self.b2b = I3DUnit(ch[3], ch[4], (3, 3, 3))
        self.b3b = I3DUnit(cin, ch[5])

    def forward(self, x):
        b0 = self.b0(x)
        b1 = self.b1b(self.b1a(x))
        b2 = self.b2b(self.b2a(x))
        b3 = self.b3b(_same_maxpool_3d(x, (3, 3, 3), (1, 1, 1)))
        return torch.cat([b0, b1, b2, b3], dim=1)


class TorchI3D(nn.Module):
    MIXED = {
        "Mixed_3b": (64, 96, 128, 16, 32, 32),
        "Mixed_3c": (128, 128, 192, 32, 96, 64),
        "Mixed_4b": (192, 96, 208, 16, 48, 64),
        "Mixed_4c": (160, 112, 224, 24, 64, 64),
        "Mixed_4d": (128, 128, 256, 24, 64, 64),
        "Mixed_4e": (112, 144, 288, 32, 64, 64),
        "Mixed_4f": (256, 160, 320, 32, 128, 128),
        "Mixed_5b": (256, 160, 320, 32, 128, 128),
        "Mixed_5c": (384, 192, 384, 48, 128, 128),
    }

    def __init__(self, num_classes=400, width=1.0):
        super().__init__()
        c = lambda n: max(1, int(round(n * width)))
        setattr(self, "Conv3d_1a_7x7", I3DUnit(3, c(64), (7, 7, 7), (2, 2, 2)))
        setattr(self, "Conv3d_2b_1x1", I3DUnit(c(64), c(64)))
        setattr(self, "Conv3d_2c_3x3", I3DUnit(c(64), c(192), (3, 3, 3)))
        cin = c(192)
        for name, ch in self.MIXED.items():
            ch = tuple(c(v) for v in ch)
            setattr(self, name, I3DMixed(cin, ch))
            cin = ch[0] + ch[2] + ch[4] + ch[5]
        self.logits = I3DUnit(cin, num_classes, bn=False, act=False, bias=True)

    def forward(self, x):
        x = getattr(self, "Conv3d_1a_7x7")(x)
        x = _same_maxpool_3d(x, (1, 3, 3), (1, 2, 2))
        x = getattr(self, "Conv3d_2b_1x1")(x)
        x = getattr(self, "Conv3d_2c_3x3")(x)
        x = _same_maxpool_3d(x, (1, 3, 3), (1, 2, 2))
        x = getattr(self, "Mixed_3b")(x)
        x = getattr(self, "Mixed_3c")(x)
        x = _same_maxpool_3d(x, (3, 3, 3), (2, 2, 2))
        for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e",
                     "Mixed_4f"):
            x = getattr(self, name)(x)
        x = _same_maxpool_3d(x, (2, 2, 2), (2, 2, 2))
        x = getattr(self, "Mixed_5b")(x)
        x = getattr(self, "Mixed_5c")(x)
        kh, kw = min(7, x.shape[3]), min(7, x.shape[4])
        x = F.avg_pool3d(x, (1, kh, kw), (1, 1, 1))
        x = self.logits(x)
        x = x.mean(dim=(3, 4))  # spatial
        return x.mean(dim=2)  # time -> (B, classes)


# ---------------------------------------------------------------------------
# Compact 3D-ResNet50 oracle (Kinetics layout: conv1/bn1/layerX.i.convY keys
# — the resnet-50-kinetics.pth format FID-VID uses, ref tool/metrics/
# features.py:31-40). From the public Hara et al. spec; width-scalable.
# ---------------------------------------------------------------------------


class R3Bottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv3d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm3d(planes)
        self.conv2 = nn.Conv3d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm3d(planes)
        self.conv3 = nn.Conv3d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm3d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        h = F.relu(self.bn1(self.conv1(x)))
        h = F.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return F.relu(h + r)


class TorchResNet3D(nn.Module):
    def __init__(self, layers=(3, 4, 6, 3), width=1.0):
        super().__init__()
        c = lambda n: max(1, int(round(n * width)))
        self.conv1 = nn.Conv3d(3, c(64), 7, (1, 2, 2), 3, bias=False)
        self.bn1 = nn.BatchNorm3d(c(64))
        self.maxpool = nn.MaxPool3d(3, 2, 1)
        inpl = c(64)
        for li, (pl, n, st) in enumerate(
            zip((64, 128, 256, 512), layers, (1, 2, 2, 2))
        ):
            p = c(pl)
            blocks = []
            for i in range(n):
                s = st if i == 0 else 1
                ds = None
                if i == 0 and (s != 1 or inpl != p * 4):
                    ds = nn.Sequential(
                        nn.Conv3d(inpl, p * 4, 1, s, bias=False),
                        nn.BatchNorm3d(p * 4))
                blocks.append(R3Bottleneck(inpl, p, s, ds))
                inpl = p * 4
            setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))

    def forward(self, x):
        t_in, s_in = x.shape[2], x.shape[3]
        h = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for li in range(1, 5):
            h = getattr(self, f"layer{li}")(h)
        kt = min(h.shape[2], math.ceil(t_in / 16))
        ks = min(h.shape[3], math.ceil(s_in / 32))
        h = F.avg_pool3d(h, (kt, ks, ks), stride=1)
        return h.flatten(1)
