"""Independent PyTorch re-derivation of the SeerUNet/FSText semantics,
used ONLY as a test oracle.

Written from the reference's *documented behavior* (SURVEY.md §2-3 and the
math in seer/models/*.py) with the reference's module structure and
parameter names (``down_blocks.0.attentions.0.transformer_blocks.0.attn1.
to_q.weight``-style), so it doubles as a fixture for testing the torch→JAX
converter against reference-style ``pytorch_model.bin`` checkpoints.

Semantics encoded here (the live paths only):
- inflated 2D convs per frame;
- ResnetBlock3D: fp32 GN(eps 1e-6) → SiLU → conv → +temb → GN → SiLU → conv
  (+1x1 shortcut on channel change);
- BasicTextTransformerBlock3D: per-frame self-attn + per-frame cross-attn to
  the 4-D FSText context + GEGLU FF;
- temporal BasicTransformerBlock3D: SWAT windowed causal attention with
  rotary over the f-major full-resolution flattening, FF skipping the first
  ``cond_frame`` frames;
- SpatialTransformer3D: GN(32→groups, eps 1e-6) → 1x1 proj_in → block →
  zero-init 1x1 proj_out + residual;
- SeerUNet: conv_in → down (skip stack) → mid → up (skip concat) →
  fp32 GN + SiLU + conv_out; timesteps flip_sin_to_cos.
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ------------------------------------------------------------- helpers

def rotary_rotate(t: torch.Tensor, rot_dim: int, positions: torch.Tensor,
                  theta: float = 10000.0) -> torch.Tensor:
    """rotary-embedding-torch 0.1.5 convention (interleaved pairs), fp32
    phases like the real package."""
    inv_freq = 1.0 / (theta ** (torch.arange(0, rot_dim, 2).float() / rot_dim))
    freqs = positions.float()[:, None] * inv_freq[None, :]
    freqs = freqs.repeat_interleave(2, dim=-1)  # (seq, rot_dim)
    t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
    x = t_rot.reshape(*t_rot.shape[:-1], rot_dim // 2, 2)
    half = torch.stack([-x[..., 1], x[..., 0]], dim=-1).reshape(t_rot.shape)
    return torch.cat([t_rot * freqs.cos() + half * freqs.sin(), t_pass], dim=-1)


def window_partition(x: torch.Tensor, ws: int) -> torch.Tensor:
    b, f, h, w, c = x.shape
    x = x.view(b, f, h // ws, ws, w // ws, ws, c)
    return x.permute(2, 4, 0, 1, 3, 5, 6).contiguous().view(-1, f * ws * ws, c)


def window_reverse(windows: torch.Tensor, ws: int, f: int, h: int, w: int) -> torch.Tensor:
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.view(h // ws, w // ws, b, f, ws, ws, c)
    return x.permute(2, 3, 0, 4, 1, 5, 6).contiguous().view(b, f, h, w, c)


def select_window_size(h: int):
    if h <= 4:
        return None
    return 8 if (h // 8) >= 4 else 4


class InflatedConv3d(nn.Conv2d):
    def forward(self, x):  # (b, c, f, h, w)
        b, c, f, h, w = x.shape
        y = super().forward(x.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w))
        return y.reshape(b, f, *y.shape[1:]).permute(0, 2, 1, 3, 4)


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
        self.net = nn.ModuleList([GEGLU(dim, dim * mult), nn.Identity(),
                                  nn.Linear(dim * mult, dim)])

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class CrossAttention(nn.Module):
    def __init__(self, query_dim, cross_dim=None, heads=8, dim_head=64,
                 temporal=False, causal=False):
        super().__init__()
        inner = heads * dim_head
        cross_dim = cross_dim or query_dim
        self.heads, self.dim_head = heads, dim_head
        self.temporal, self.causal = temporal, causal
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(cross_dim, inner, bias=False)
        self.to_v = nn.Linear(cross_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim), nn.Identity()])

    def _heads(self, t):
        b, n, _ = t.shape
        return t.reshape(b, n, self.heads, self.dim_head).permute(0, 2, 1, 3)

    def forward(self, x, context=None, positions=None):
        ctx = x if context is None else context
        q, k, v = self._heads(self.to_q(x)), self._heads(self.to_k(ctx)), self._heads(self.to_v(ctx))
        n, m = q.shape[2], k.shape[2]
        if self.temporal:
            rot = min(32, self.dim_head)
            pos = positions if positions is not None else torch.arange(n)
            q = rotary_rotate(q, rot, pos)
            k = rotary_rotate(k, rot, pos if m == n else torch.arange(m))
        s = torch.einsum("bhnd,bhmd->bhnm", q.float(), k.float()) * self.dim_head**-0.5
        if self.temporal and self.causal:
            mask = torch.ones(n, m, dtype=torch.bool).tril(m - n)
            s = s.masked_fill(~mask, float("-inf"))
        p = s.softmax(-1).to(v.dtype)
        o = torch.einsum("bhnm,bhmd->bhnd", p, v)
        o = o.permute(0, 2, 1, 3).reshape(o.shape[0], n, -1)
        return self.to_out[0](o)


class WindowSTempAttention(CrossAttention):
    def forward(self, x):  # (b, f, h, w, c)
        b, f, h, w, c = x.shape
        n = f * h * w
        hid = x.reshape(b, n, c)
        q, k, v = self._heads(self.to_q(hid)), self._heads(self.to_k(hid)), self._heads(self.to_v(hid))
        rot = min(32, self.dim_head)
        pos = torch.arange(n)
        q, k = rotary_rotate(q, rot, pos), rotary_rotate(k, rot, pos)
        ws = select_window_size(h)
        bh = b * self.heads
        grid = lambda t: t.reshape(bh, f, h, w, self.dim_head)  # noqa: E731
        if ws is None:
            qw, kw, vw = (t.reshape(bh, n, self.dim_head) for t in (q, k, v))
        else:
            qw, kw, vw = (window_partition(grid(t), ws) for t in (q, k, v))
        tokens = qw.shape[1]
        s = torch.einsum("bnd,bmd->bnm", qw.float(), kw.float()) * self.dim_head**-0.5
        if self.causal:
            mask = torch.ones(tokens, tokens, dtype=torch.bool).tril(0)
            s = s.masked_fill(~mask, float("-inf"))
        p = s.softmax(-1).to(vw.dtype)
        ow = torch.einsum("bnm,bmd->bnd", p, vw)
        if ws is None:
            o = ow.reshape(b, self.heads, n, self.dim_head)
        else:
            o = window_reverse(ow, ws, f, h, w).reshape(b, self.heads, n, self.dim_head)
        o = o.permute(0, 2, 1, 3).reshape(b, n, -1)
        return self.to_out[0](o).reshape(b, f, h, w, c)


class BasicTextTransformerBlock3D(nn.Module):
    def __init__(self, dim, heads, dim_head, context_dim):
        super().__init__()
        self.attn1 = CrossAttention(dim, heads=heads, dim_head=dim_head)
        self.attn2 = CrossAttention(dim, context_dim, heads=heads, dim_head=dim_head)
        self.ff = FeedForward(dim)
        self.norm1, self.norm2, self.norm3 = (nn.LayerNorm(dim) for _ in range(3))

    def forward(self, x, context):  # x: (b, f, h, w, c); ctx: (b, f, l, d)
        b, f, h, w, c = x.shape
        x = x.reshape(b * f, h * w, c)
        x = self.attn1(self.norm1(x)) + x
        ctx = context.reshape(b * f, *context.shape[2:])
        x = self.attn2(self.norm2(x), ctx) + x
        x = self.ff(self.norm3(x)) + x
        return x.reshape(b, f, h, w, c)


class BasicTransformerBlock3DTemporal(nn.Module):
    def __init__(self, dim, heads, dim_head, causal=True):
        super().__init__()
        self.attn1 = WindowSTempAttention(dim, heads=heads, dim_head=dim_head,
                                          temporal=True, causal=causal)
        self.ff = FeedForward(dim)
        self.norm1, self.norm3 = nn.LayerNorm(dim), nn.LayerNorm(dim)

    def forward(self, x, cond_frame=0):  # (b, f, h, w, c)
        b, f, h, w, c = x.shape
        flat = x.reshape(b, f * h * w, c)
        normed = self.norm1(flat).reshape(b, f, h, w, c)
        flat = self.attn1(normed).reshape(b, f * h * w, c) + flat
        if cond_frame > 0:
            x0, rest = flat[:, : cond_frame * h * w], flat[:, cond_frame * h * w :]
            rest = self.ff(self.norm3(rest)) + rest
            flat = torch.cat([x0, rest], dim=1)
        else:
            flat = self.ff(self.norm3(flat)) + flat
        return flat.reshape(b, f, h, w, c)


class SpatialTransformer3D(nn.Module):
    def __init__(self, channels, heads, dim_head, groups, context_dim=None,
                 temporal=False, causal=False):
        super().__init__()
        inner = heads * dim_head
        self.temporal = temporal
        self.norm = nn.GroupNorm(groups, channels, eps=1e-6)
        self.proj_in = InflatedConv3d(channels, inner, 1)
        if temporal:
            self.transformer_blocks = nn.ModuleList(
                [BasicTransformerBlock3DTemporal(inner, heads, dim_head, causal)])
        else:
            self.transformer_blocks = nn.ModuleList(
                [BasicTextTransformerBlock3D(inner, heads, dim_head, context_dim)])
        self.proj_out = InflatedConv3d(inner, channels, 1)
        nn.init.zeros_(self.proj_out.weight)
        nn.init.zeros_(self.proj_out.bias)

    def forward(self, x, context=None, cond_frame=0):  # (b, c, f, h, w)
        x_in = x
        h = self.norm(x)
        h = self.proj_in(h)
        h = h.permute(0, 2, 3, 4, 1)  # (b, f, h, w, c)
        for blk in self.transformer_blocks:
            h = blk(h, cond_frame) if self.temporal else blk(h, context)
        h = h.permute(0, 4, 1, 2, 3)
        return self.proj_out(h) + x_in


class ResnetBlock3D(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=1e-6)
        self.conv1 = InflatedConv3d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=1e-6)
        self.conv2 = InflatedConv3d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = InflatedConv3d(in_ch, out_ch, 1) if in_ch != out_ch else None

    def forward(self, x, temb):
        h = F.silu(self.norm1(x.float()).to(x.dtype))
        h = self.conv1(h)
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None, None]
        h = F.silu(self.norm2(h.float()).to(h.dtype))
        h = self.conv2(h)
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class Downsample3D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = InflatedConv3d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class Upsample3D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = InflatedConv3d(ch, ch, 3, padding=1)

    def forward(self, x):
        x = F.interpolate(x, scale_factor=(1.0, 2.0, 2.0), mode="nearest")
        return self.conv(x)


class VAEResnet2D(nn.Module):
    def __init__(self, in_ch, out_ch, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=1e-6)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=1e-6)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class VAEAttention2D(nn.Module):
    """diffusers VAE AttentionBlock: single head, pre-scaled q/k."""

    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.query = nn.Linear(ch, ch)
        self.key = nn.Linear(ch, ch)
        self.value = nn.Linear(ch, ch)
        self.proj_attn = nn.Linear(ch, ch)

    def forward(self, x):  # (b, c, h, w)
        b, c, h, w = x.shape
        res = x
        y = self.group_norm(x).reshape(b, c, h * w).permute(0, 2, 1)
        q, k, v = self.query(y), self.key(y), self.value(y)
        scale = 1.0 / math.sqrt(math.sqrt(c))
        s = torch.einsum("bnc,bmc->bnm", q * scale, k * scale)
        p = s.softmax(-1)
        o = torch.einsum("bnm,bmc->bnc", p, v)
        o = self.proj_attn(o).permute(0, 2, 1).reshape(b, c, h, w)
        return o + res


class TinyVAE(nn.Module):
    """diffusers AutoencoderKL structure + names at toy scale."""

    def __init__(self, boc=(16, 32), layers=1, groups=8, latent=4):
        super().__init__()
        self.boc, self.layers, self.latent = boc, layers, latent
        enc = nn.Module()
        enc.conv_in = nn.Conv2d(3, boc[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        out_ch = boc[0]
        for i, ch in enumerate(boc):
            blk = nn.Module()
            blk.resnets = nn.ModuleList([VAEResnet2D(out_ch if j == 0 else ch, ch, groups)
                                         for j in range(layers)])
            if i != len(boc) - 1:
                ds = nn.Module()
                ds.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)
                blk.downsamplers = nn.ModuleList([ds])
            enc.down_blocks.append(blk)
            out_ch = ch
        enc.mid_block = nn.Module()
        enc.mid_block.resnets = nn.ModuleList([VAEResnet2D(out_ch, out_ch, groups),
                                               VAEResnet2D(out_ch, out_ch, groups)])
        enc.mid_block.attentions = nn.ModuleList([VAEAttention2D(out_ch, groups)])
        enc.conv_norm_out = nn.GroupNorm(groups, out_ch, eps=1e-6)
        enc.conv_out = nn.Conv2d(out_ch, 2 * latent, 3, padding=1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = nn.Conv2d(latent, latent, 1)

        dec = nn.Module()
        rboc = list(reversed(boc))
        dec.conv_in = nn.Conv2d(latent, rboc[0], 3, padding=1)
        dec.mid_block = nn.Module()
        dec.mid_block.resnets = nn.ModuleList([VAEResnet2D(rboc[0], rboc[0], groups),
                                               VAEResnet2D(rboc[0], rboc[0], groups)])
        dec.mid_block.attentions = nn.ModuleList([VAEAttention2D(rboc[0], groups)])
        dec.up_blocks = nn.ModuleList()
        out_ch = rboc[0]
        for i, ch in enumerate(rboc):
            blk = nn.Module()
            blk.resnets = nn.ModuleList([VAEResnet2D(out_ch if j == 0 else ch, ch, groups)
                                         for j in range(layers + 1)])
            if i != len(rboc) - 1:
                us = nn.Module()
                us.conv = nn.Conv2d(ch, ch, 3, padding=1)
                blk.upsamplers = nn.ModuleList([us])
            dec.up_blocks.append(blk)
            out_ch = ch
        dec.conv_norm_out = nn.GroupNorm(groups, out_ch, eps=1e-6)
        dec.conv_out = nn.Conv2d(out_ch, 3, 3, padding=1)
        self.decoder = dec

    def encode_moments(self, x):  # (b, 3, h, w)
        e = self.encoder
        h = e.conv_in(x)
        for i, blk in enumerate(e.down_blocks):
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "downsamplers"):
                h = F.pad(h, (0, 1, 0, 1))
                h = blk.downsamplers[0].conv(h)
        h = e.mid_block.resnets[0](h)
        h = e.mid_block.attentions[0](h)
        h = e.mid_block.resnets[1](h)
        h = e.conv_out(F.silu(e.conv_norm_out(h)))
        return self.quant_conv(h)

    def decode(self, z):
        d = self.decoder
        h = d.conv_in(self.post_quant_conv(z))
        h = d.mid_block.resnets[0](h)
        h = d.mid_block.attentions[0](h)
        h = d.mid_block.resnets[1](h)
        for i, blk in enumerate(d.up_blocks):
            for r in blk.resnets:
                h = r(h)
            if hasattr(blk, "upsamplers"):
                h = F.interpolate(h, scale_factor=2.0, mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return d.conv_out(F.silu(d.conv_norm_out(h)))


class BasicLinearBlock(nn.Module):
    """FSText inner block (reference attention.py:328-427, live paths)."""

    def __init__(self, dim, heads, dim_head, context_dim=None, temporal=False):
        super().__init__()
        self.temporal = temporal
        self.attn1 = CrossAttention(dim, heads=heads, dim_head=dim_head,
                                    temporal=temporal, causal=True)
        self.ff = FeedForward(dim)
        self.norm1 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)
        if not temporal:
            self.attn2 = CrossAttention(dim, context_dim, heads=heads, dim_head=dim_head)
            self.norm2 = nn.LayerNorm(dim)

    def forward(self, x, context=None):  # (b, f, l, c)
        b, f, l, c = x.shape
        if self.temporal:
            x = x.permute(0, 2, 1, 3).reshape(b * l, f, c)
            x = self.attn1(self.norm1(x)) + x
            x = self.ff(self.norm3(x)) + x
            return x.reshape(b, l, f, c).permute(0, 2, 1, 3)
        x = x.reshape(b * f, l, c)
        x = self.attn1(self.norm1(x)) + x
        x = x.reshape(b, f * l, c)
        x = self.attn2(self.norm2(x), context) + x
        x = self.ff(self.norm3(x)) + x
        return x.reshape(b, f, l, c)


class TinyFSText(nn.Module):
    """Reference FSTextTransformer structure + names (unet_3d_condition.py:379-484)."""

    MAX_LENGTH = 1024

    def __init__(self, num_frames=4, dim=16, heads=4, num_layers=2,
                 pos_frames=8):
        super().__init__()
        self.num_frames = num_frames
        self.learnable_query = nn.Parameter(torch.zeros(1, 1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, pos_frames, self.MAX_LENGTH, dim))
        self.trf_blocks = nn.ModuleList()
        for _ in range(num_layers):
            blk = nn.Module()
            blk.transformer_blocks = nn.ModuleList([
                BasicLinearBlock(dim, heads, dim // heads, context_dim=dim),
                BasicLinearBlock(dim, heads, dim // heads, temporal=True),
            ])
            self.trf_blocks.append(blk)
        self.norm = nn.LayerNorm(dim)

    def forward(self, context):  # (b, l, c)
        b, l, c = context.shape
        x = self.learnable_query.expand(b, self.num_frames, l, -1)
        pe = self.pos_embed[:, :, :l, :]
        if self.pos_embed.shape[1] != self.num_frames:
            pe = F.interpolate(pe.permute(0, 3, 1, 2),
                               size=(self.num_frames, l)).permute(0, 2, 3, 1)
        x = x + pe
        for blk in self.trf_blocks:
            x = blk.transformer_blocks[0](x, context)
            x = blk.transformer_blocks[1](x, None)
        return self.norm(x)


def timestep_embedding(t, dim):
    half = dim // 2
    freqs = torch.exp(-math.log(10000) * torch.arange(half, dtype=torch.float64) / half)
    ang = t.double()[:, None] * freqs[None, :]
    emb = torch.cat([torch.sin(ang), torch.cos(ang)], dim=-1).float()
    return torch.cat([emb[:, half:], emb[:, :half]], dim=-1)  # flip_sin_to_cos


class TinySeerUNet(nn.Module):
    """2-level SeerUNet with the reference block wiring + names."""

    def __init__(self, boc=(32, 64), layers=1, groups=8, ctx_dim=16, heads=4):
        super().__init__()
        self.boc, self.layers, self.heads = boc, layers, heads
        temb_dim = boc[0] * 4
        self.conv_in = InflatedConv3d(4, boc[0], 3, padding=1)
        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(boc[0], temb_dim)
        self.time_embedding.linear_2 = nn.Linear(temb_dim, temb_dim)

        def make_attn_pair(ch):
            attn = SpatialTransformer3D(ch, heads, ch // heads, groups, ctx_dim)
            tattn = SpatialTransformer3D(ch, heads, ch // heads, groups,
                                         temporal=True, causal=True)
            return attn, tattn

        # down 0: cross-attn block (with downsample), down 1: plain block
        self.down_blocks = nn.ModuleList()
        d0 = nn.Module()
        d0.resnets = nn.ModuleList([ResnetBlock3D(boc[0], boc[0], temb_dim, groups)])
        a, t = make_attn_pair(boc[0])
        d0.attentions = nn.ModuleList([a])
        d0.temporal_attentions = nn.ModuleList([t])
        d0.downsamplers = nn.ModuleList([Downsample3D(boc[0])])
        self.down_blocks.append(d0)
        d1 = nn.Module()
        d1.resnets = nn.ModuleList([ResnetBlock3D(boc[0], boc[1], temb_dim, groups)])
        self.down_blocks.append(d1)

        mid = nn.Module()
        mid.resnets = nn.ModuleList([ResnetBlock3D(boc[1], boc[1], temb_dim, groups),
                                     ResnetBlock3D(boc[1], boc[1], temb_dim, groups)])
        a, t = make_attn_pair(boc[1])
        mid.attentions = nn.ModuleList([a])
        mid.temporal_attentions = nn.ModuleList([t])
        self.mid_block = mid

        # up 0: plain (layers+1 resnets), up 1: cross-attn
        self.up_blocks = nn.ModuleList()
        u0 = nn.Module()
        u0.resnets = nn.ModuleList([
            ResnetBlock3D(boc[1] + boc[1], boc[1], temb_dim, groups),
            ResnetBlock3D(boc[1] + boc[0], boc[1], temb_dim, groups),
        ])
        u0.upsamplers = nn.ModuleList([Upsample3D(boc[1])])
        self.up_blocks.append(u0)
        u1 = nn.Module()
        u1.resnets = nn.ModuleList([
            ResnetBlock3D(boc[1] + boc[0], boc[0], temb_dim, groups),
            ResnetBlock3D(boc[0] + boc[0], boc[0], temb_dim, groups),
        ])
        u1.attentions = nn.ModuleList([])
        u1.temporal_attentions = nn.ModuleList([])
        for _ in range(2):
            a, t = make_attn_pair(boc[0])
            u1.attentions.append(a)
            u1.temporal_attentions.append(t)
        self.up_blocks.append(u1)

        self.conv_norm_out = nn.GroupNorm(groups, boc[0], eps=1e-5)
        self.conv_out = InflatedConv3d(boc[0], 4, 3, padding=1)

    def forward(self, x, t, context, cond_frame=0):  # x: (b, 4, f, h, w)
        temb = timestep_embedding(t, self.boc[0])
        temb = self.time_embedding.linear_2(F.silu(self.time_embedding.linear_1(temb)))
        h = self.conv_in(x)
        skips = [h]
        d0 = self.down_blocks[0]
        h = d0.resnets[0](h, temb)
        h = d0.attentions[0](h, context)
        h = d0.temporal_attentions[0](h, cond_frame=cond_frame)
        skips.append(h)
        h = d0.downsamplers[0](h)
        skips.append(h)
        h = self.down_blocks[1].resnets[0](h, temb)
        skips.append(h)

        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, context)
        h = self.mid_block.temporal_attentions[0](h, cond_frame=cond_frame)
        h = self.mid_block.resnets[1](h, temb)

        u0 = self.up_blocks[0]
        for i in range(2):
            h = torch.cat([h, skips.pop()], dim=1)
            h = u0.resnets[i](h, temb)
        h = u0.upsamplers[0](h)
        u1 = self.up_blocks[1]
        for i in range(2):
            h = torch.cat([h, skips.pop()], dim=1)
            h = u1.resnets[i](h, temb)
            h = u1.attentions[i](h, context)
            h = u1.temporal_attentions[i](h, cond_frame=cond_frame)

        h = self.conv_norm_out(h.float()).to(h.dtype)
        h = F.silu(h)
        return self.conv_out(h)
