"""CLIP ViT-L/14 text encoder in Flax.

Covers the reference's frozen ``CLIPTextModel.from_pretrained(...,
subfolder="text_encoder")`` (reference ``train.py:159-174``): returns the
last hidden state ``(b, 77, 768)`` used as the FSText context.  Causal
attention mask plus optional padding mask (the reference passes
``attention_mask`` from the tokenizer, ``train.py:330-334``).

quick_gelu activation, pre-LN transformer, learned position embeddings.
Parameter names follow the HF module paths for the weight converter.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5


CLIP_VIT_L14_TEXT_CONFIG = CLIPTextConfig()


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        heads = cfg.num_attention_heads
        d = cfg.hidden_size // heads
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b, n, _ = x.shape

        def proj(name):
            return (
                nn.Dense(cfg.hidden_size, name=name, **kw)(x)
                .reshape(b, n, heads, d)
                .transpose(0, 2, 1, 3)
            )

        q = proj("q_proj") * (d**-0.5)
        k = proj("k_proj")
        v = proj("v_proj")
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
        logits = jnp.where(mask, logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, name="out_proj", **kw)(out)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        residual = x
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, param_dtype=self.param_dtype,
                         name="layer_norm1")(x)
        x = CLIPAttention(cfg, name="self_attn", **kw)(x, mask)
        x = x + residual
        residual = x
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, param_dtype=self.param_dtype,
                         name="layer_norm2")(x)
        x = nn.Dense(cfg.intermediate_size, name="fc1", **kw)(x)
        x = quick_gelu(x)
        x = nn.Dense(cfg.hidden_size, name="fc2", **kw)(x)
        return x + residual


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig = CLIP_VIT_L14_TEXT_CONFIG
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, input_ids: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """input_ids: (b, 77) int32 -> last hidden state (b, 77, 768)."""
        cfg = self.config
        b, n = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, param_dtype=self.param_dtype,
                       dtype=self.dtype, name="token_embedding")(input_ids)
        pos_table = self.param(
            "position_embedding", nn.initializers.zeros,
            (cfg.max_position_embeddings, cfg.hidden_size), self.param_dtype,
        )
        x = tok + pos_table[None, :n, :].astype(self.dtype)

        causal = jnp.tril(jnp.ones((n, n), dtype=bool))[None, None]
        if attention_mask is not None:
            pad = attention_mask[:, None, None, :].astype(bool)
            mask = jnp.logical_and(causal, pad)
        else:
            mask = causal

        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(cfg, dtype=self.dtype, param_dtype=self.param_dtype,
                                 name=f"layers_{i}")(x, mask)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, param_dtype=self.param_dtype,
                            name="final_layer_norm")(x)
