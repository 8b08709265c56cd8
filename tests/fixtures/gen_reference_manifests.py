"""Generate name→shape manifests of the checkpoints the reference loads.

The zero-egress environment has no SD-1.5 weights, but the *name/shape
contract* of every checkpoint the reference consumes is derivable locally:

- **SeerUNet / FSText** (``pytorch_model.bin`` / ``pytorch_model_1.bin``,
  strict-loaded at ``/root/reference/inference.py:119-128``): instantiated
  from the reference's own ``seer/models`` torch code on the meta device,
  with minimal stubs for diffusers 0.10.2 / xformers / rotary-embedding-torch
  (pinned in the reference ``requirements.txt``).  Stub fidelity notes:
  - diffusers 0.10.2 ``TimestepEmbedding`` has ``linear_1``/``linear_2``;
  - rotary-embedding-torch 0.1.5 registers ``freqs`` as a persistent buffer,
    so every temporal attention contributes an ``…rotary_emb.freqs`` key;
- **SD-1.5 2D UNet** (inflation source, ``train.py:175-180``): the SeerUNet
  manifest minus the 3D-only keys (temporal attentions) — exactly the subset
  the reference's name-matched ``from_pretrained`` load consumes;
- **CLIP ViT-L/14 text encoder**: transformers (installed) on meta device;
- **SD VAE** (``AutoencoderKL``): rule-generated from the diffusers 0.10.2
  architecture (128/256/512/512 channels, 2 resnets per block, mid attention
  with ``query/key/value/proj_attn`` naming, double-z quant convs).

Run:  python tests/fixtures/gen_reference_manifests.py
Writes seervideoldm_tpu/io/reference_manifests.json (packaged: the export
path ships it as the reference checkpoint contract).
"""
from __future__ import annotations

import json
import os
import sys
import types

import torch
from torch import nn

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir,
                   os.pardir, "seervideoldm_tpu", "io",
                   "reference_manifests.json")
REF = "/root/reference"


# --- minimal stubs for the reference's pinned third-party deps ---

def _install_stubs():
    diffusers = types.ModuleType("diffusers")
    cfg_utils = types.ModuleType("diffusers.configuration_utils")

    class ConfigMixin:
        config_name = "config.json"

    def register_to_config(fn):
        return fn

    cfg_utils.ConfigMixin = ConfigMixin
    cfg_utils.register_to_config = register_to_config

    modeling_utils = types.ModuleType("diffusers.modeling_utils")

    class ModelMixin(nn.Module):
        pass

    modeling_utils.ModelMixin = ModelMixin

    utils_mod = types.ModuleType("diffusers.utils")

    class BaseOutput(dict):
        pass

    class _Logging:
        @staticmethod
        def get_logger(name=None):
            import logging

            return logging.getLogger(name or "stub")

    utils_mod.BaseOutput = BaseOutput
    utils_mod.logging = _Logging()
    utils_mod.deprecate = lambda *a, **k: None
    import_utils = types.ModuleType("diffusers.utils.import_utils")
    import_utils.is_xformers_available = lambda: False
    utils_mod.import_utils = import_utils

    models_mod = types.ModuleType("diffusers.models")
    embeddings = types.ModuleType("diffusers.models.embeddings")

    class Timesteps(nn.Module):
        def __init__(self, num_channels, flip_sin_to_cos, downscale_freq_shift):
            super().__init__()
            self.num_channels = num_channels

    class TimestepEmbedding(nn.Module):
        # diffusers 0.10.2 names: linear_1 / linear_2
        def __init__(self, in_channels, time_embed_dim, act_fn="silu", out_dim=None):
            super().__init__()
            self.linear_1 = nn.Linear(in_channels, time_embed_dim)
            self.act = nn.SiLU()
            self.linear_2 = nn.Linear(time_embed_dim, out_dim or time_embed_dim)

    class ImagePositionalEmbeddings(nn.Module):
        pass

    embeddings.Timesteps = Timesteps
    embeddings.TimestepEmbedding = TimestepEmbedding
    embeddings.ImagePositionalEmbeddings = ImagePositionalEmbeddings
    models_mod.embeddings = embeddings

    rotary = types.ModuleType("rotary_embedding_torch")

    class RotaryEmbedding(nn.Module):
        # rotary-embedding-torch 0.1.5: freqs is a persistent buffer
        def __init__(self, dim, theta=10000):
            super().__init__()
            freqs = 1.0 / (theta ** (torch.arange(0, dim, 2).float() / dim))
            self.register_buffer("freqs", freqs)

        def rotate_queries_or_keys(self, x):
            return x

    rotary.RotaryEmbedding = RotaryEmbedding

    xformers = types.ModuleType("xformers")
    xf_comp = types.ModuleType("xformers.components")
    xf_attn = types.ModuleType("xformers.components.attention")

    class AttentionMask:
        pass

    xf_attn.AttentionMask = AttentionMask
    xf_comp.attention = xf_attn
    xformers.components = xf_comp

    sys.modules.update({
        "diffusers": diffusers,
        "diffusers.configuration_utils": cfg_utils,
        "diffusers.modeling_utils": modeling_utils,
        "diffusers.utils": utils_mod,
        "diffusers.utils.import_utils": import_utils,
        "diffusers.models": models_mod,
        "diffusers.models.embeddings": embeddings,
        "rotary_embedding_torch": rotary,
        "xformers": xformers,
        "xformers.components": xf_comp,
        "xformers.components.attention": xf_attn,
    })
    diffusers.configuration_utils = cfg_utils
    diffusers.modeling_utils = modeling_utils
    diffusers.utils = utils_mod
    diffusers.models = models_mod


def _manifest(module: nn.Module) -> dict[str, list[int]]:
    return {k: list(v.shape) for k, v in module.state_dict().items()}


def seer_manifests() -> tuple[dict, dict]:
    _install_stubs()
    sys.path.insert(0, REF)
    from seer.models.unet_3d_condition import FSTextTransformer, SeerUNet

    with torch.device("meta"):
        # SD-1.5 overrides cross_attention_dim to 768 via the loaded config
        # (SURVEY §2.5.6); everything else is the class default.
        sunet = SeerUNet(cross_attention_dim=768)
        fstext = FSTextTransformer(num_frames=16, num_layers=8)
    return _manifest(sunet), _manifest(fstext)


def clip_manifest() -> dict:
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig(  # ViT-L/14 text encoder (SD-1.5 text_encoder)
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12,
        max_position_embeddings=77,
    )
    with torch.device("meta"):
        model = CLIPTextModel(cfg)
    return {k: list(v.shape) for k, v in model.state_dict().items()
            if "position_ids" not in k}


def vae_manifest() -> dict:
    """SD AutoencoderKL, diffusers 0.10.2 naming (query/key/value mid attn)."""
    m: dict[str, list[int]] = {}
    ch = [128, 256, 512, 512]
    latent = 4

    def conv(name, cin, cout, k=3):
        m[f"{name}.weight"] = [cout, cin, k, k]
        m[f"{name}.bias"] = [cout]

    def norm(name, c):
        m[f"{name}.weight"] = [c]
        m[f"{name}.bias"] = [c]

    def resnet(name, cin, cout):
        norm(f"{name}.norm1", cin)
        conv(f"{name}.conv1", cin, cout)
        norm(f"{name}.norm2", cout)
        conv(f"{name}.conv2", cout, cout)
        if cin != cout:
            conv(f"{name}.conv_shortcut", cin, cout, k=1)

    def attn(name, c):
        norm(f"{name}.group_norm", c)
        for proj in ("query", "key", "value", "proj_attn"):
            m[f"{name}.{proj}.weight"] = [c, c]
            m[f"{name}.{proj}.bias"] = [c]

    # encoder
    conv("encoder.conv_in", 3, ch[0])
    cin = ch[0]
    for i, cout in enumerate(ch):
        for j in range(2):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", cin if j == 0 else cout, cout)
        cin = cout
        if i < len(ch) - 1:
            conv(f"encoder.down_blocks.{i}.downsamplers.0.conv", cout, cout)
    resnet("encoder.mid_block.resnets.0", ch[-1], ch[-1])
    attn("encoder.mid_block.attentions.0", ch[-1])
    resnet("encoder.mid_block.resnets.1", ch[-1], ch[-1])
    norm("encoder.conv_norm_out", ch[-1])
    conv("encoder.conv_out", ch[-1], 2 * latent)
    # quant (double z)
    conv("quant_conv", 2 * latent, 2 * latent, k=1)
    conv("post_quant_conv", latent, latent, k=1)
    # decoder
    conv("decoder.conv_in", latent, ch[-1])
    resnet("decoder.mid_block.resnets.0", ch[-1], ch[-1])
    attn("decoder.mid_block.attentions.0", ch[-1])
    resnet("decoder.mid_block.resnets.1", ch[-1], ch[-1])
    rev = list(reversed(ch))  # 512, 512, 256, 128
    cin = ch[-1]
    for i, cout in enumerate(rev):
        for j in range(3):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", cin if j == 0 else cout, cout)
        cin = cout
        if i < len(rev) - 1:
            conv(f"decoder.up_blocks.{i}.upsamplers.0.conv", cout, cout)
    norm("decoder.conv_norm_out", ch[0])
    conv("decoder.conv_out", ch[0], 3)
    return m


def main() -> None:
    sunet, fstext = seer_manifests()
    sd15_unet = {k: v for k, v in sunet.items() if "temporal_attentions" not in k}
    data = {
        "seer_unet": sunet,
        "fstext": fstext,
        "sd15_unet_2d": sd15_unet,
        "sd15_vae": vae_manifest(),
        "sd15_clip_text": clip_manifest(),
    }
    counts = {k: (len(v), sum(int(torch.tensor(s).prod()) for s in v.values()))
              for k, v in data.items()}
    with open(OUT, "w") as f:
        json.dump(data, f, indent=0, sort_keys=True)
    for name, (nkeys, nparams) in counts.items():
        print(f"{name}: {nkeys} keys, {nparams / 1e6:.1f}M params")


if __name__ == "__main__":
    main()
