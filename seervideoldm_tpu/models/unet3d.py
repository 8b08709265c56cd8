"""SeerUNet — the SD-1.5 UNet inflated to video with causal temporal attention.

Parity with reference ``seer/models/unet_3d_condition.py:61-376``:

- block types hardcoded: down = 3×CrossAttnDownBlock3D + DownBlock3D,
  up = UpBlock3D + 3×CrossAttnUpBlock3D, mid = UNetMidBlock3DCrossAttn with
  ``text_frame_condition=True, causal=True`` (``:90-91, 145-157``);
- timestep → sinusoidal (flip_sin_to_cos=True, freq_shift=0) → MLP
  (``:97-100, 297-308``);
- forward: conv_in → down (skip stack) → mid → up (skip concat) → fp32
  GroupNorm + SiLU + conv_out (``:283-376``);
- ``cond_frame`` threaded to every temporal attention block;
- SD-1.5's loaded config overrides ``cross_attention_dim`` to 768 (the class
  default 1280 is never live; SURVEY §2.5.6) — our default is 768.

Layout: channels-last. ``sample`` is ``(b, f, h, w, c)``; use
``seervideoldm_tpu.utils.layout`` helpers to convert from the reference's
``(b, c, f, h, w)``.  ``remat=True`` wraps each top-level block in
``jax.checkpoint`` for memory-bound training.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.conv import InflatedConv
from ..ops.norms import GroupNorm
from .embeddings import TimestepEmbedding, timestep_embedding
from .unet_blocks import (
    CrossAttnDownBlock3D,
    CrossAttnUpBlock3D,
    DownBlock3D,
    UNetMidBlock3DCrossAttn,
    UpBlock3D,
)


@dataclass(frozen=True)
class SeerUNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    center_input_sample: bool = False
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    downsample_padding: int = 1
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    cross_attention_dim: int = 768
    attention_head_dim: int = 8
    # reference set_attention_slice(slice_size) (unet_3d_condition.py:214-277):
    # compute spatial/text attention in `attention_slice`-head chunks.  A
    # construction-time config here (functional flax) instead of a mutator.
    attention_slice: Optional[int] = None
    # Token Merging (ToMeSD, arXiv 2303.17604; ops/tome.py — beyond
    # reference): merge tome_ratio*N redundant spatial tokens around the
    # spatial self-attention in blocks with >= tome_min_tokens tokens.
    # 0.0 = off (parity default).
    tome_ratio: float = 0.0
    tome_min_tokens: int = 1024
    tome_sd: int = 2
    # FreeU (arXiv 2309.11497; ops/freeu.py — beyond reference): training-
    # free (b1, b2, s1, s2) backbone/skip reweighting at the two deepest
    # up-block stages.  None = off (parity).  SD-1.5 recipe: (1.5, 1.6,
    # 0.9, 0.2).
    freeu: Optional[Sequence[float]] = None


SEER_UNET_SD15_CONFIG = SeerUNetConfig()


class SeerUNet(nn.Module):
    config: SeerUNetConfig = SEER_UNET_SD15_CONFIG
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # False: no remat.  True / "block": full per-block remat.  "save_attn":
    # per-block remat that SAVES the named attention/FF outputs — backward
    # recompute skips re-running the attention kernels for ~8 MB/site of
    # extra saved activations (the fused attention backwards recompute
    # scores internally anyway, so full remat ran every attention twice).
    remat: bool | str = False
    collect_attn: bool = False  # reference return_attn: sow cross-attn maps
    # retrieve with: unet.apply(..., mutable=["intermediates"])
    # Optional NamedSharding for the (b, f, h, w, c) activations, anchored
    # at every block boundary (sequence parallelism: shard f over a 'seq'
    # mesh axis — spatial convs/attention are frame-local so they stay
    # sharded; GSPMD inserts the all-gather only around the temporal
    # attention flatten).  Build with parallel.mesh.video_sharding(mesh).
    activation_sharding: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        context: jnp.ndarray,
        cond_frame: int = 0,
        pab: Optional[dict] = None,
    ) -> jnp.ndarray:
        """sample: (b, f, h, w, 4) latents; timesteps: (b,) or scalar;
        context: (b, f, l, 768) FSText per-frame sub-instruction embeddings.

        ``pab``: static Pyramid-Attention-Broadcast flags for this step mode
        (diffusion/pab.py) — requires ``mutable=["pab"]`` on apply and is a
        sampling-time feature (incompatible with remat: the flags must stay
        Python-static through the block calls)."""
        cfg = self.config
        if pab is not None and self.remat:
            raise ValueError("PAB is a sampling-time feature; build the UNet with remat=False")
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        boc = tuple(cfg.block_out_channels)
        time_embed_dim = boc[0] * 4

        if cfg.center_input_sample:
            sample = 2 * sample - 1.0

        timesteps = jnp.asarray(timesteps)
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps[None], (sample.shape[0],))

        t_emb = timestep_embedding(
            timesteps, boc[0], flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift,
        )
        emb = TimestepEmbedding(time_embed_dim, name="time_embedding", **kw)(
            t_emb.astype(self.dtype)
        )

        if self.activation_sharding is not None:
            import jax as _jax

            constrain = lambda t: _jax.lax.with_sharding_constraint(  # noqa: E731
                t, self.activation_sharding)
        else:
            constrain = lambda t: t  # noqa: E731

        sample = constrain(
            InflatedConv(boc[0], (3, 3), padding=1, name="conv_in", **kw)(sample))

        if not self.remat:
            maybe_remat = lambda cls: cls  # noqa: E731
        elif self.remat == "save_attn":
            import jax as _jax

            policy = _jax.checkpoint_policies.save_only_these_names(
                "attn_out", "ff_out"
            )
            maybe_remat = lambda cls: nn.remat(  # noqa: E731
                cls, static_argnums=(), policy=policy
            )
        else:
            maybe_remat = lambda cls: nn.remat(cls, static_argnums=())  # noqa: E731

        # --- down ---
        down_block_res: tuple = (sample,)
        output_channel = boc[0]
        num_blocks = len(boc)
        for i in range(num_blocks):
            input_channel = output_channel
            output_channel = boc[i]
            is_final = i == num_blocks - 1
            if not is_final:
                sample, res_samples = maybe_remat(CrossAttnDownBlock3D)(
                    in_channels=input_channel, out_channels=output_channel,
                    temb_channels=time_embed_dim, num_layers=cfg.layers_per_block,
                    resnet_eps=cfg.norm_eps, resnet_groups=cfg.norm_num_groups,
                    attn_num_head_channels=cfg.attention_head_dim,
                    cross_attention_dim=cfg.cross_attention_dim,
                    downsample_padding=cfg.downsample_padding,
                    add_downsample=True, text_frame_condition=True, causal=True,
                    cond_frame=cond_frame, collect_attn=self.collect_attn,
                    attention_slice=cfg.attention_slice,
                    tome_ratio=cfg.tome_ratio,
                    tome_min_tokens=cfg.tome_min_tokens, tome_sd=cfg.tome_sd,
                    name=f"down_blocks_{i}", **kw,
                )(sample, temb=emb, encoder_hidden_states=context, pab=pab)
                sample = constrain(sample)
            else:
                sample, res_samples = maybe_remat(DownBlock3D)(
                    in_channels=input_channel, out_channels=output_channel,
                    temb_channels=time_embed_dim, num_layers=cfg.layers_per_block,
                    resnet_eps=cfg.norm_eps, resnet_groups=cfg.norm_num_groups,
                    downsample_padding=cfg.downsample_padding, add_downsample=False,
                    name=f"down_blocks_{i}", **kw,
                )(sample, temb=emb)
                sample = constrain(sample)
            down_block_res += res_samples

        # --- mid ---
        sample = maybe_remat(UNetMidBlock3DCrossAttn)(
            in_channels=boc[-1], temb_channels=time_embed_dim,
            resnet_eps=cfg.norm_eps, resnet_groups=cfg.norm_num_groups,
            attn_num_head_channels=cfg.attention_head_dim,
            cross_attention_dim=cfg.cross_attention_dim,
            text_frame_condition=True, causal=True, cond_frame=cond_frame,
            collect_attn=self.collect_attn, attention_slice=cfg.attention_slice,
            tome_ratio=cfg.tome_ratio,
            tome_min_tokens=cfg.tome_min_tokens, tome_sd=cfg.tome_sd,
            name="mid_block", **kw,
)(sample, temb=emb, encoder_hidden_states=context, pab=pab)
        sample = constrain(sample)

        # --- up ---
        reversed_boc = list(reversed(boc))
        output_channel = reversed_boc[0]
        for i in range(num_blocks):
            prev_output_channel = output_channel
            output_channel = reversed_boc[i]
            input_channel = reversed_boc[min(i + 1, num_blocks - 1)]
            is_final = i == num_blocks - 1
            num_layers = cfg.layers_per_block + 1
            res_samples = down_block_res[-num_layers:]
            down_block_res = down_block_res[:-num_layers]
            # FreeU engages at the two deepest up stages (resolution_idx
            # 0 and 1 in the published recipe): (b1, s1) then (b2, s2)
            freeu_stage = None
            if cfg.freeu is not None and i < 2:
                b1, b2, s1, s2 = cfg.freeu
                freeu_stage = (float(b1), float(s1)) if i == 0 else (
                    float(b2), float(s2))
            if i == 0:
                sample = maybe_remat(UpBlock3D)(
                    in_channels=input_channel, prev_output_channel=prev_output_channel,
                    out_channels=output_channel, temb_channels=time_embed_dim,
                    num_layers=num_layers, resnet_eps=cfg.norm_eps,
                    resnet_groups=cfg.norm_num_groups, add_upsample=not is_final,
                    freeu=freeu_stage,
                    name=f"up_blocks_{i}", **kw,
                )(sample, res_samples, temb=emb)
                sample = constrain(sample)
            else:
                sample = maybe_remat(CrossAttnUpBlock3D)(
                    in_channels=input_channel, out_channels=output_channel,
                    prev_output_channel=prev_output_channel, temb_channels=time_embed_dim,
                    num_layers=num_layers, resnet_eps=cfg.norm_eps,
                    resnet_groups=cfg.norm_num_groups,
                    attn_num_head_channels=cfg.attention_head_dim,
                    cross_attention_dim=cfg.cross_attention_dim,
                    add_upsample=not is_final, text_frame_condition=True, causal=True,
                    cond_frame=cond_frame, collect_attn=self.collect_attn,
                    attention_slice=cfg.attention_slice,
                    tome_ratio=cfg.tome_ratio,
                    tome_min_tokens=cfg.tome_min_tokens, tome_sd=cfg.tome_sd,
                    freeu=freeu_stage,
                    name=f"up_blocks_{i}", **kw,
                )(sample, res_samples, temb=emb, encoder_hidden_states=context, pab=pab)
                sample = constrain(sample)

        # --- out (fp32 GroupNorm island, unet_3d_condition.py:365-370) ---
        sample = GroupNorm(
            cfg.norm_num_groups, eps=cfg.norm_eps,
            param_dtype=self.param_dtype, name="conv_norm_out",
        )(sample)
        sample = nn.silu(sample)
        return InflatedConv(
            cfg.out_channels, (3, 3), padding=1, name="conv_out", **kw
        )(sample)
