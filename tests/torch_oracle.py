"""Independent PyTorch implementation of the original DDPM/DDIM UNet.

Used ONLY as a numerical oracle in tests: its state_dict has the exact key
layout of the published DDIM checkpoints (model-790000.ckpt etc.), so running
it against our JAX UNet through `convert_ddim_state_dict` validates both the
architecture and the converter at once.  Written from the public architecture
description (Ho et al. 2020; Song et al. 2021) — deliberately NOT from the
reference repo, whose Model is a different (rewritten) graph.
"""
import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t, dim):
    half = dim // 2
    freqs = torch.exp(torch.arange(half, dtype=torch.float32) * -(math.log(10000) / (half - 1)))
    args = t.float()[:, None] * freqs[None, :]
    emb = torch.cat([torch.sin(args), torch.cos(args)], dim=1)
    if dim % 2:
        emb = F.pad(emb, (0, 1))
    return emb


def norm(c):
    return nn.GroupNorm(32 if c % 32 == 0 else c, c, eps=1e-6)


class ResBlock(nn.Module):
    def __init__(self, cin, cout, temb_ch, dropout):
        super().__init__()
        self.norm1 = norm(cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.temb_proj = nn.Linear(temb_ch, cout)
        self.norm2 = norm(cout)
        self.dropout = nn.Dropout(dropout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.cin, self.cout = cin, cout
        if cin != cout:
            self.nin_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.temb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(self.dropout(F.silu(self.norm2(h))))
        if self.cin != self.cout:
            x = self.nin_shortcut(x)
        return x + h


class AttnBlock(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = norm(c)
        self.q = nn.Conv2d(c, c, 1)
        self.k = nn.Conv2d(c, c, 1)
        self.v = nn.Conv2d(c, c, 1)
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.norm(x)
        q = self.q(h).reshape(B, C, H * W).permute(0, 2, 1)
        k = self.k(h).reshape(B, C, H * W)
        v = self.v(h).reshape(B, C, H * W).permute(0, 2, 1)
        w = torch.bmm(q, k) * (C ** -0.5)
        w = torch.softmax(w, dim=-1)
        h = torch.bmm(w, v).permute(0, 2, 1).reshape(B, C, H, W)
        return x + self.proj_out(h)


class Down(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class Up(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class TorchDDIMUNet(nn.Module):
    def __init__(self, *, ch=128, out_ch=3, ch_mult=(1, 2, 2, 2), num_res_blocks=2,
                 attn_resolutions=(16,), dropout=0.0, in_channels=3, resolution=32,
                 resamp_with_conv=True):
        super().__init__()
        assert resamp_with_conv
        self.ch, self.temb_ch = ch, ch * 4
        num_levels = len(ch_mult)
        in_ch_mult = (1,) + tuple(ch_mult)
        self.num_res_blocks = num_res_blocks
        self.num_levels = num_levels

        self.temb = nn.Module()
        self.temb.dense = nn.ModuleList([
            nn.Linear(ch, self.temb_ch), nn.Linear(self.temb_ch, self.temb_ch)])
        self.conv_in = nn.Conv2d(in_channels, ch, 3, padding=1)

        curr_res = resolution
        self.down = nn.ModuleList()
        block_in = ch
        for i in range(num_levels):
            level = nn.Module()
            level.block = nn.ModuleList()
            level.attn = nn.ModuleList()
            block_in = ch * in_ch_mult[i]
            block_out = ch * ch_mult[i]
            for _ in range(num_res_blocks):
                level.block.append(ResBlock(block_in, block_out, self.temb_ch, dropout))
                block_in = block_out
                if curr_res in attn_resolutions:
                    level.attn.append(AttnBlock(block_in))
            if i != num_levels - 1:
                level.downsample = Down(block_in)
                curr_res //= 2
            self.down.append(level)

        self.mid = nn.Module()
        self.mid.block_1 = ResBlock(block_in, block_in, self.temb_ch, dropout)
        self.mid.attn_1 = AttnBlock(block_in)
        self.mid.block_2 = ResBlock(block_in, block_in, self.temb_ch, dropout)

        self.up = nn.ModuleList([nn.Module() for _ in range(num_levels)])
        for i in reversed(range(num_levels)):
            level = self.up[i]
            level.block = nn.ModuleList()
            level.attn = nn.ModuleList()
            block_out = ch * ch_mult[i]
            for j in range(num_res_blocks + 1):
                skip_in = ch * ch_mult[i]
                if j == num_res_blocks:
                    skip_in = ch * in_ch_mult[i]
                level.block.append(ResBlock(block_in + skip_in, block_out, self.temb_ch, dropout))
                block_in = block_out
                if curr_res in attn_resolutions:
                    level.attn.append(AttnBlock(block_in))
            if i != 0:
                level.upsample = Up(block_in)
                curr_res *= 2

        self.norm_out = norm(block_in)
        self.conv_out = nn.Conv2d(block_in, out_ch, 3, padding=1)

    def forward(self, x, t):
        temb = timestep_embedding(t, self.ch)
        temb = self.temb.dense[0](temb)
        temb = self.temb.dense[1](F.silu(temb))

        hs = [self.conv_in(x)]
        for i, level in enumerate(self.down):
            for j, blk in enumerate(level.block):
                h = blk(hs[-1], temb)
                if level.attn:
                    h = level.attn[j](h)
                hs.append(h)
            if i != self.num_levels - 1:
                hs.append(level.downsample(hs[-1]))

        h = hs[-1]
        h = self.mid.block_1(h, temb)
        h = self.mid.attn_1(h)
        h = self.mid.block_2(h, temb)

        for i in reversed(range(self.num_levels)):
            level = self.up[i]
            for j, blk in enumerate(level.block):
                h = blk(torch.cat([h, hs.pop()], dim=1), temb)
                if level.attn:
                    h = level.attn[j](h)
            if i != 0:
                h = level.upsample(h)

        return self.conv_out(F.silu(self.norm_out(h)))
