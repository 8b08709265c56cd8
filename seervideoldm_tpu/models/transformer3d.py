"""Spatial/temporal/text transformer blocks of the SeerUNet.

Parity with reference ``seer/models/attention.py``:

- ``FeedForward`` with GEGLU gating (``attention.py:705-793``);
- ``BasicTextTransformerBlock3D`` (``:265-327``) — per-frame spatial
  self-attention + per-frame cross-attention to that frame's FSText
  sub-instruction (4-D context reshaped to ``(b*f, l, d)``);
- ``BasicTransformerBlock3D`` temporal variant (``:181-263``) — SWAT
  windowed causal spatio-temporal self-attention, and a feed-forward whose
  residual **skips the first ``cond_frame`` frames** (``:241-246``);
- ``SpatialTransformer3D`` (``:97-151``) — fp32 GroupNorm → 1x1 proj_in →
  blocks → **zero-initialized** 1x1 proj_out (+ residual), the inflation
  trick that makes fresh temporal layers start as identity (``:126-127``).

Layout: channels-last ``(b, f, h, w, c)`` throughout.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
from jax.ad_checkpoint import checkpoint_name
import jax.numpy as jnp

from ..diffusion.pab import CROSS, SPATIAL, TEMPORAL
from ..ops.attention import CrossAttention, WindowTemporalAttention
from ..ops.conv import InflatedConv
from ..ops.norms import GroupNorm, LayerNorm


def _pab_cache_missing():
    raise ValueError(
        "PAB cache read before it was written — the first sampler step (and "
        "the priming eval_shape) must use the all-compute mode so every "
        "attention site stores its delta before any step broadcasts it."
    )


def _pab_residual(mod: nn.Module, name: str, use_cached: bool, compute_fn):
    """Attention residual delta under Pyramid Attention Broadcast.

    ``use_cached`` is a *static* Python bool (one ``lax.switch`` branch per
    step mode — see diffusion/pab.py): when True the cached delta from the
    ``pab`` variable collection is reused and the attention computation is
    absent from this branch's graph; when False the delta is computed and
    stored.  Requires ``mutable=["pab"]`` on apply.
    """
    if use_cached:
        return mod.variable("pab", name, _pab_cache_missing).value
    delta = compute_fn()
    cache = mod.variable("pab", name, lambda: delta)
    cache.value = delta
    return delta


class _DenseParams(nn.Module):
    """Parameter container matching ``nn.Dense``'s names, shapes, and
    initializers (same path -> same init RNG draws), for paths that need the
    raw kernel/bias instead of the fused matmul."""

    in_features: int
    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), self.param_dtype)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        return kernel, bias


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.pallas import get_activation_mesh

        reg = get_activation_mesh()
        mesh = reg[0] if reg is not None else None
        tp = (mesh is not None and mesh.shape.get("model", 1) > 1
              and self.dim_out % mesh.shape["model"] == 0)
        if not tp:
            x = nn.Dense(
                self.dim_out * 2, dtype=self.dtype,
                param_dtype=self.param_dtype, name="proj")(x)
            hidden, gate = jnp.split(x, 2, axis=-1)
            return hidden * nn.gelu(gate, approximate=False)
        # Tensor parallelism: the fused [hidden; gate] column layout makes a
        # contiguous P(None, 'model') kernel sharding put ALL hidden columns
        # on the first model ranks and ALL gate columns on the last — the
        # hidden*gelu(gate) product then has no zero-comm layout and GSPMD
        # falls back to full rematerialization of the (b, n, 2*inner)
        # activation.  The Megatron form: two matmuls against the kernel
        # halves, each column-sharded over 'model', so the product is
        # elementwise-local and net_2's P('model', None) kernel closes with
        # one psum.  The half reshards are loop-invariant (weights), hoisted
        # out of the sampling scan by LICM; math is bitwise identical to the
        # fused matmul (column-split of a dot).
        import jax as _jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        kernel, bias = _DenseParams(
            in_features=x.shape[-1], features=self.dim_out * 2,
            param_dtype=self.param_dtype, name="proj")()
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype)
        col = NamedSharding(mesh, P(None, "model"))
        vec = NamedSharding(mesh, P("model"))
        out_spec = NamedSharding(
            mesh, P(*([P.UNCONSTRAINED] * (x.ndim - 1) + ["model"])))
        wsc = _jax.lax.with_sharding_constraint

        def half(lo, hi):
            w = wsc(kernel[:, lo:hi], col)
            b = wsc(bias[lo:hi], vec)
            return wsc(x @ w + b, out_spec)

        hidden = half(0, self.dim_out)
        gate = half(self.dim_out, 2 * self.dim_out)
        return hidden * nn.gelu(gate, approximate=False)


class _GEGLUParams(nn.Module):
    """Parameter shell matching GEGLU's tree (net_0/proj/{kernel,bias})."""

    in_features: int
    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        return _DenseParams(self.in_features, self.features,
                            self.param_dtype, name="proj")()


class _LNParams(nn.Module):
    """Parameter shell matching ops/norms.LayerNorm's tree ({scale,bias})."""

    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        return scale, bias


class _FFParams(nn.Module):
    """Parameter shell matching FeedForward's tree (net_0/proj/*, net_2/*)."""

    dim: int
    mult: int = 4
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        inner = int(self.dim * self.mult)
        w1, b1 = _GEGLUParams(self.dim, inner * 2, self.param_dtype,
                              name="net_0")()
        w2, b2 = _DenseParams(inner, self.dim, self.param_dtype,
                              name="net_2")()
        return w1, b1, w2, b2


def _ln_ff_residual(dim: int, kw: dict, x: jnp.ndarray) -> jnp.ndarray:
    """``x + FeedForward(LayerNorm(x))`` with the LN prologue and residual
    epilogue fused into the GEGLU kernel when supported
    (ops/pallas/geglu_ff.py::ln_geglu_ff): the LN output and the residual
    re-read never round-trip HBM — two full passes saved per FF site at
    zero extra traffic (the residual is the kernel's own input block).

    Must be called from within a parent module's ``@nn.compact __call__``.
    Both paths create the IDENTICAL param tree (norm3/{scale,bias},
    ff/net_0/proj/*, ff/net_2/*) — checkpoints are interchangeable.
    Reference semantics: ``seer/models/attention.py:241-246, 325-327``."""
    from ..ops.pallas import get_activation_mesh, pallas_enabled
    from ..ops.pallas.geglu_ff import ln_geglu_ff, ln_geglu_ff_preferred

    dtype, param_dtype = kw["dtype"], kw["param_dtype"]
    inner = dim * 4
    lead, c = x.shape[:-1], x.shape[-1]
    n = 1
    for s in lead:
        n *= int(s)
    # the fused kernel is an opaque custom call GSPMD cannot partition;
    # any registered mesh keeps the XLA path (sharding-friendly).
    # ln_geglu_ff_preferred also gates on channel width: at c=640 the LN
    # fusion is noise-to-negative on-chip, so those sites keep the
    # LayerNorm + FeedForward chain (plain geglu_ff kernel inside).
    if (c == dim and pallas_enabled() and get_activation_mesh() is None
            and ln_geglu_ff_preferred(n, c, inner, x.dtype)):
        scale, bias = _LNParams(c, param_dtype, name="norm3")()
        w1, b1, w2, b2 = _FFParams(dim, param_dtype=param_dtype, name="ff")()
        w1, b1, w2, b2 = nn.dtypes.promote_dtype(
            w1, b1, w2, b2, dtype=dtype)
        out = ln_geglu_ff(x.reshape(n, c), scale, bias, w1, b1, w2, b2)
        return checkpoint_name(out.reshape(*lead, c), "ff_out")
    return FeedForward(dim, name="ff", **kw)(
        LayerNorm(param_dtype=param_dtype, name="norm3")(x)) + x


def _ln_ff_proj_residual(dim: int, kw: dict, x: jnp.ndarray,
                         w3: jnp.ndarray, b3: jnp.ndarray,
                         res: jnp.ndarray) -> jnp.ndarray:
    """``res + proj_out(x + FeedForward(LayerNorm(x)))`` — the whole
    transformer-site tail in ONE fused kernel where supported
    (ops/pallas/geglu_ff.py::ln_geglu_ff_proj): vs chaining
    ``_ln_ff_residual`` + the XLA 1x1 proj_out + the outer residual add,
    the (tokens, c) intermediate, the proj read/write, and the residual
    re-read never round-trip HBM — three passes saved per site on top of
    the LN fusion (FLOORBUDGET.json 'glue' headroom).

    ``w3``: the site's proj_out 1x1 kernel reshaped (c, c); ``b3``: its
    bias; ``res``: the SpatialTransformer3D input, token-flattened.  Param
    tree created here is IDENTICAL to ``_ln_ff_residual`` (norm3/ff);
    proj_out params are owned by the caller.  Reference semantics:
    ``seer/models/attention.py:126-151`` (proj_out + residual) after
    ``:241-246`` (ff + residual)."""
    from ..ops.pallas import get_activation_mesh, pallas_enabled
    from ..ops.pallas.geglu_ff import (ln_geglu_ff_proj,
                                       ln_geglu_ff_proj_preferred)

    dtype, param_dtype = kw["dtype"], kw["param_dtype"]
    inner = dim * 4
    lead, c = x.shape[:-1], x.shape[-1]
    n = 1
    for s in lead:
        n *= int(s)
    if (c == dim and pallas_enabled() and get_activation_mesh() is None
            and ln_geglu_ff_proj_preferred(n, c, inner, x.dtype)):
        scale, bias = _LNParams(c, param_dtype, name="norm3")()
        w1, b1, w2, b2 = _FFParams(dim, param_dtype=param_dtype, name="ff")()
        w1, b1, w2, b2 = nn.dtypes.promote_dtype(
            w1, b1, w2, b2, dtype=dtype)
        out = ln_geglu_ff_proj(x.reshape(n, c), scale, bias, w1, b1, w2, b2,
                               w3, b3, res.reshape(n, c))
        return checkpoint_name(out.reshape(*lead, c), "ff_out")
    y = FeedForward(dim, name="ff", **kw)(
        LayerNorm(param_dtype=param_dtype, name="norm3")(x)) + x
    z = jnp.dot(y, w3.astype(y.dtype), preferred_element_type=jnp.float32)
    return (z.astype(y.dtype) + b3.astype(y.dtype)) + res


class FeedForward(nn.Module):
    """GEGLU(dim -> 4*dim) -> Dense(4*dim -> dim). Names mirror torch ff.net.{0,2}.

    On a single-device TPU with supported shapes the whole chain runs as
    ONE pallas kernel (ops/pallas/geglu_ff.py): the (tokens, 2*inner)
    GEGLU intermediate never touches HBM — the dominant above-floor cost
    of every FF site in the 512px budget (STATUS round-4 item 10).  Both
    paths create the identical parameter tree (same names/shapes/init RNG
    draws), so checkpoints are interchangeable.
    """

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = int(self.dim * self.mult)
        from ..ops.pallas import get_activation_mesh, pallas_enabled
        from ..ops.pallas.geglu_ff import geglu_ff, geglu_ff_supported

        lead, c = x.shape[:-1], x.shape[-1]
        n = 1
        for s in lead:
            n *= int(s)
        # the fused kernel is an opaque custom call GSPMD cannot partition;
        # any registered mesh keeps the XLA path (sharding-friendly)
        if (c == self.dim and pallas_enabled()
                and get_activation_mesh() is None
                and geglu_ff_supported(n, c, inner, x.dtype)):
            w1, b1 = _GEGLUParams(c, inner * 2, self.param_dtype,
                                  name="net_0")()
            w2, b2 = _DenseParams(inner, self.dim, self.param_dtype,
                                  name="net_2")()
            w1, b1, w2, b2 = nn.dtypes.promote_dtype(
                w1, b1, w2, b2, dtype=self.dtype)
            out = geglu_ff(x.reshape(n, c), w1, b1, w2, b2)
            return checkpoint_name(out.reshape(*lead, self.dim), "ff_out")
        x = GEGLU(inner, dtype=self.dtype, param_dtype=self.param_dtype, name="net_0")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="net_2")(x)
        return checkpoint_name(x, "ff_out")


class BasicTextTransformerBlock3D(nn.Module):
    """Per-frame self-attn + per-frame cross-attn to FSText sub-instructions."""

    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    collect_attn: bool = False  # sow cross-attn maps (reference return_attn)
    attention_slice: Optional[int] = None  # reference set_attention_slice
    # Token Merging (ToMeSD, arXiv 2303.17604; ops/tome.py — beyond
    # reference): merge tome_ratio*N redundant spatial tokens before the
    # self-attention and unmerge after, when the block has at least
    # tome_min_tokens spatial tokens.  0.0 = off (parity).
    tome_ratio: float = 0.0
    tome_min_tokens: int = 1024
    tome_sd: int = 2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        pab: Optional[dict] = None,
    ) -> jnp.ndarray:
        """x: (b, f, h, w, c). context: (b, f, l, d) FSText embeddings.

        ``pab``: static Pyramid-Attention-Broadcast flags for this step mode
        (``{"spatial": bool, "cross": bool, ...}``); None = PAB off."""
        b, f, h, w, c = x.shape
        x = x.reshape(b * f, h * w, c)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        attn1 = CrossAttention(
            query_dim=self.dim, heads=self.n_heads, dim_head=self.d_head,
            attention_slice=self.attention_slice, name="attn1", **kw
        )
        norm1 = LayerNorm(param_dtype=self.param_dtype, name="norm1")
        merge = unmerge = None
        if self.tome_ratio > 0.0 and h * w >= self.tome_min_tokens:
            from ..ops.tome import bipartite_soft_matching_2d

            # matching features are the block-input hidden states (pre-norm),
            # as in ToMeSD; indices are data-dependent but all shapes static
            merge, unmerge = bipartite_soft_matching_2d(
                x, h, w, int(self.tome_ratio * h * w), sd=self.tome_sd
            )

        def self_attn(xin):
            xn = norm1(xin)
            if merge is None:
                return attn1(xn)
            return unmerge(attn1(merge(xn)))

        if pab is None:
            x = self_attn(x) + x
        else:
            x_self = x
            x = _pab_residual(
                self, "attn1_delta", pab[SPATIAL], lambda: self_attn(x_self)
            ) + x
        if context is not None:
            d = context.shape[-1]
            ctx = context.reshape(b * f, -1, d)
            attn2 = CrossAttention(
                query_dim=self.dim,
                cross_attention_dim=self.context_dim,
                heads=self.n_heads,
                dim_head=self.d_head,
                collect_attn=self.collect_attn,
                attention_slice=self.attention_slice,
                name="attn2",
                **kw,
            )
            norm2 = LayerNorm(param_dtype=self.param_dtype, name="norm2")
            if pab is None:
                x = attn2(norm2(x), context=ctx) + x
            else:
                x_cross = x
                x = _pab_residual(
                    self, "attn2_delta", pab[CROSS],
                    lambda: attn2(norm2(x_cross), context=ctx),
                ) + x
        x = _ln_ff_residual(self.dim, kw, x)
        return x.reshape(b, f, h, w, c)


class BasicTransformerBlock3D(nn.Module):
    """Reference BasicTransformerBlock3D.

    ``temporal=True`` (the live UNet configuration): SWAT windowed causal
    attention over the full video, then feed-forward skipping the first
    ``cond_frame`` frames' residual.  ``temporal=False`` kept for parity
    completeness (per-frame self-attn + global cross-attn).
    """

    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    temporal: bool = False
    causal: bool = False
    cond_frame: int = 0  # static: first cond_frame frames bypass the FF residual
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        pab: Optional[dict] = None,
        fuse_out: Optional[tuple] = None,
    ) -> jnp.ndarray:
        b, f, h, w, c = x.shape
        cond_frame = self.cond_frame
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.temporal:
            x = x.reshape(b, f * h * w, c)
            norm1 = LayerNorm(param_dtype=self.param_dtype, name="norm1")
            attn1 = WindowTemporalAttention(
                query_dim=self.dim,
                heads=self.n_heads,
                dim_head=self.d_head,
                causal=self.causal,
                name="attn1",
                **kw,
            )
            x_tokens = x

            def compute_delta():
                x_norm = norm1(x_tokens)
                return attn1(x_norm.reshape(b, f, h, w, c)).reshape(b, f * h * w, c)

            if pab is None:
                x = compute_delta() + x
            else:
                x = _pab_residual(
                    self, "attn1_delta", pab[TEMPORAL], compute_delta
                ) + x
            if cond_frame > 0:
                # cond-frame tokens bypass the FF residual (attention.py:241-246)
                x0, rest = x[:, : cond_frame * h * w], x[:, cond_frame * h * w :]
                rest = _ln_ff_residual(self.dim, kw, rest)
                x = jnp.concatenate([x0, rest], axis=1)
            elif fuse_out is not None:
                # site-tail fusion: the caller's proj_out + outer residual
                # ride the FF kernel's epilogue; this return IS the final
                # SpatialTransformer3D output (cond_frame == 0 only — the
                # FF-skip split would leave cond tokens un-projected)
                w3, b3, res = fuse_out
                x = _ln_ff_proj_residual(self.dim, kw, x, w3, b3, res)
                return x.reshape(b, f, h, w, c)
            else:
                x = _ln_ff_residual(self.dim, kw, x)
            return x.reshape(b, f, h, w, c)

        # non-temporal variant (unused by the live SeerUNet config)
        if pab is not None:
            raise ValueError(
                "PAB is implemented for the live SeerUNet block configuration "
                "only (text_frame_condition / temporal blocks)"
            )
        x = x.reshape(b * f, h * w, c)
        x = CrossAttention(
            query_dim=self.dim, heads=self.n_heads, dim_head=self.d_head, name="attn1", **kw
        )(LayerNorm(param_dtype=self.param_dtype, name="norm1")(x)) + x
        x = x.reshape(b, f * h * w, c)
        if context is not None:
            x = CrossAttention(
                query_dim=self.dim,
                cross_attention_dim=self.context_dim,
                heads=self.n_heads,
                dim_head=self.d_head,
                name="attn2",
                **kw,
            )(LayerNorm(param_dtype=self.param_dtype, name="norm2")(x), context=context) + x
        x = _ln_ff_residual(self.dim, kw, x)
        return x.reshape(b, f, h, w, c)


class _Conv1x1Leaf(nn.Module):
    """Leaf creating nn.Conv-shaped (1,1) kernel/bias params (zero-init,
    the proj_out inflation trick)."""

    in_features: int
    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.zeros,
            (1, 1, self.in_features, self.features), self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        return kernel, bias


class _InflatedConv1x1Params(nn.Module):
    """Parameter shell matching InflatedConv(features, (1,1))'s tree
    (conv/{kernel (1,1,cin,cout), bias}) with the zero initializers of the
    proj_out site — same path -> identical checkpoint tree whether the
    site runs the conv or the fused kernel tail."""

    in_features: int
    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        return _Conv1x1Leaf(self.in_features, self.features,
                            self.param_dtype, name="conv")()


class SpatialTransformer3D(nn.Module):
    """GroupNorm → 1x1 proj_in → transformer blocks → zero-init 1x1 proj_out + residual."""

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    temporal: bool = False
    text_frame_condition: bool = False
    causal: bool = False
    cond_frame: int = 0
    norm_num_groups: int = 32  # reference hardcodes 32 (attention.py:109)
    collect_attn: bool = False
    attention_slice: Optional[int] = None  # reference set_attention_slice
    tome_ratio: float = 0.0  # ToMe spatial-token merging (ops/tome.py)
    tome_min_tokens: int = 1024
    tome_sd: int = 2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        pab: Optional[dict] = None,
    ) -> jnp.ndarray:
        inner_dim = self.n_heads * self.d_head
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x_in = x
        b, f, h, w, _ = x.shape

        # Site-tail fusion gate (static): the final temporal block's FF
        # kernel absorbs proj_out + the outer residual
        # (ops/pallas/geglu_ff.py::ln_geglu_ff_proj) when the FF fusion
        # itself is the measured winner at this width.  cond_frame > 0
        # (training) keeps the unfused tail — the FF-skip split leaves the
        # cond tokens un-projected inside the kernel.
        fuse_tail = False
        if (self.temporal and not self.text_frame_condition
                and self.depth >= 1 and self.cond_frame == 0
                and self.in_channels == inner_dim):
            from ..ops.pallas import get_activation_mesh, pallas_enabled
            from ..ops.pallas.geglu_ff import ln_geglu_ff_proj_preferred

            fuse_tail = (
                pallas_enabled() and get_activation_mesh() is None
                and ln_geglu_ff_proj_preferred(
                    b * f * h * w, inner_dim, inner_dim * 4, x.dtype)
            )

        x = GroupNorm(
            self.norm_num_groups, eps=1e-6, param_dtype=self.param_dtype, name="norm"
        )(x)
        x = InflatedConv(inner_dim, (1, 1), padding=0, name="proj_in", **kw)(x)
        fuse_out = None
        if fuse_tail:
            k3, b3 = _InflatedConv1x1Params(
                inner_dim, self.in_channels, self.param_dtype,
                name="proj_out")()
            k3, b3 = nn.dtypes.promote_dtype(k3, b3, dtype=self.dtype)
            fuse_out = (k3.reshape(inner_dim, self.in_channels), b3,
                        x_in.reshape(b, f * h * w, self.in_channels))
        for d in range(self.depth):
            if self.text_frame_condition:
                x = BasicTextTransformerBlock3D(
                    inner_dim, self.n_heads, self.d_head,
                    context_dim=self.context_dim, collect_attn=self.collect_attn,
                    attention_slice=self.attention_slice,
                    tome_ratio=self.tome_ratio,
                    tome_min_tokens=self.tome_min_tokens, tome_sd=self.tome_sd,
                    name=f"transformer_blocks_{d}", **kw,
                )(x, context=context, pab=pab)
            else:
                x = BasicTransformerBlock3D(
                    inner_dim, self.n_heads, self.d_head,
                    context_dim=self.context_dim, temporal=self.temporal, causal=self.causal,
                    cond_frame=self.cond_frame,
                    name=f"transformer_blocks_{d}", **kw,
                )(x, context=context, pab=pab,
                  fuse_out=fuse_out if d == self.depth - 1 else None)
        if fuse_out is not None:
            return x  # proj_out + residual already applied in-kernel
        # zero-initialized output projection: fresh temporal layers start as identity
        x = InflatedConv(
            self.in_channels, (1, 1), padding=0,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="proj_out", **kw,
        )(x)
        return x + x_in
