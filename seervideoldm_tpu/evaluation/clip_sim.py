"""CLIP similarity (CLIPSIM) for text→video evaluation — beyond reference.

The reference evaluates FVD/KVD (visual quality vs ground truth) and C3D
inception score (``eval.py:163-248``) but nothing measures *text
faithfulness*; CLIPSIM — mean cosine similarity between each generated
frame's CLIP image embedding and the prompt's CLIP text embedding — is the
standard metric for that (GODIVA/NUWA protocol, arXiv 2104.14806 §4).

This implements the CLIP ViT image tower in Flax (the text tower is shared
with the SD text encoder, ``models/clip_text.py`` — OpenAI CLIP ViT-L/14
*is* SD-1.5's text encoder), plus the two projection heads and the cosine
scoring.  Weights come from a local HF ``CLIPModel`` state dict via
``convert_clip_vision`` / ``convert_clip_projections`` (zero-egress: same
pattern as every other pretrained component, ``io/convert.py``).

Preprocessing follows the OpenAI CLIP transform: bicubic resize to the
image size, rescale to [0,1], normalize with the CLIP mean/std.
"""
from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip_text import CLIPEncoderLayer, CLIPTextConfig

CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5


CLIP_VIT_L14_VISION_CONFIG = CLIPVisionConfig()


class CLIPVisionModel(nn.Module):
    """HF ``CLIPVisionTransformer`` semantics; returns the pooled (class
    token, post-layernorm) embedding ``(b, hidden)``.

    Parameter names mirror the HF module paths (incl. the upstream
    ``pre_layrnorm`` typo) for the weight converter.
    """

    config: CLIPVisionConfig = CLIP_VIT_L14_VISION_CONFIG
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        """pixels: (b, H, W, 3), already CLIP-normalized."""
        cfg = self.config
        b = pixels.shape[0]
        patches = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="patch_embedding",
        )(pixels)
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,), self.param_dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size)),
             patches], axis=1)
        n = x.shape[1]
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (n, cfg.hidden_size), self.param_dtype)
        x = x + pos[None].astype(self.dtype)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                         param_dtype=self.param_dtype, name="pre_layrnorm")(x)
        # the text encoder layer IS the vision encoder layer (HF shares the
        # class); vision attention is full (non-causal, no padding)
        text_like = CLIPTextConfig(
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            layer_norm_eps=cfg.layer_norm_eps,
        )
        mask = jnp.ones((1, 1, n, n), dtype=bool)
        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(text_like, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"layers_{i}")(x, mask)
        pooled = x[:, 0]
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                            param_dtype=self.param_dtype,
                            name="post_layernorm")(pooled)


class CLIPProjections(nn.Module):
    """The two no-bias projection heads of HF ``CLIPModel``."""

    projection_dim: int = 768
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(features=self.projection_dim, use_bias=False,
                  dtype=self.dtype, param_dtype=self.param_dtype)
        self.visual_projection = nn.Dense(**kw)
        self.text_projection = nn.Dense(**kw)

    def __call__(self, pooled_image, pooled_text):
        return (self.visual_projection(pooled_image),
                self.text_projection(pooled_text))


def pool_text_eos(hidden: jnp.ndarray, input_ids: jnp.ndarray) -> jnp.ndarray:
    """HF CLIP text pooling: the hidden state at the (first) EOS position —
    ``input_ids.argmax(-1)`` works because ``<|endoftext|>`` is the highest
    token id (49407) and CLIP pads with it."""
    eos = jnp.argmax(input_ids, axis=-1)
    return hidden[jnp.arange(hidden.shape[0]), eos]


def preprocess_frames(frames: jnp.ndarray, image_size: int) -> jnp.ndarray:
    """(n, h, w, 3) in [0, 1] -> CLIP-normalized (n, S, S, 3).

    OpenAI CLIP transform: bicubic resize to S×S + normalize.  Inputs here
    are already square (the pipeline's resolution crop), so resize IS the
    center crop."""
    n, _, _, c = frames.shape
    frames = jax.image.resize(frames, (n, image_size, image_size, c), "cubic")
    mean = jnp.asarray(CLIP_IMAGE_MEAN, frames.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, frames.dtype)
    return (frames - mean) / std


def clip_similarity(image_features: jnp.ndarray,
                    text_features: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity per row: (n, d) x (n, d) -> (n,)."""
    a = image_features / jnp.linalg.norm(image_features, axis=-1, keepdims=True)
    b = text_features / jnp.linalg.norm(text_features, axis=-1, keepdims=True)
    return jnp.sum(a * b, axis=-1)


def make_clip_sim_fn(vision, text, projections, vision_params, text_params,
                     proj_params):
    """Jitted (videos, input_ids, attention_mask) -> per-clip CLIPSIM.

    videos: (b, f, h, w, 3) in [0, 1]; the score for a clip is the mean
    frame-vs-prompt cosine similarity (GODIVA protocol)."""
    image_size = vision.config.image_size

    @jax.jit
    def score(videos, input_ids, attention_mask, vision_params, text_params,
              proj_params):
        b, f = videos.shape[:2]
        frames = preprocess_frames(
            videos.reshape(b * f, *videos.shape[2:]), image_size)
        pooled_img = vision.apply({"params": vision_params}, frames)
        hidden = text.apply({"params": text_params}, input_ids, attention_mask)
        pooled_txt = pool_text_eos(hidden, input_ids)
        img_feat, txt_feat = projections.apply(
            {"params": proj_params}, pooled_img, pooled_txt)
        sims = clip_similarity(
            img_feat.reshape(b, f, -1).reshape(b * f, -1),
            jnp.repeat(txt_feat, f, axis=0))
        return sims.reshape(b, f).mean(axis=1)

    return lambda videos, ids, mask: score(videos, ids, mask, vision_params,
                                           text_params, proj_params)
