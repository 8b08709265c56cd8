"""Attention ops and the CrossAttention module.

Semantics follow the reference ``seer/models/attention.py:429-703``:

- QKV linear (no bias), multi-head reshape, scaled dot-product with softmax;
- ``temporal=True`` applies rotary embeddings (rot_dim = min(32, dim_head))
  to q/k using per-token *positions* supplied by the caller;
- ``causal=True`` masks with ``tril(j - i)`` over the token sequence.  For
  the SWAT windowed path this reproduces the xformers
  ``LowerTriangularMask`` behavior over f-major flattened window tokens —
  the only causal semantics the reference ever actually executes (its eager
  mask path is shape-broken; see SURVEY §2.5.1);
- output projection ``to_out_0`` (with bias), zero-initialized projections
  are handled by the *callers* (SpatialTransformer3D proj_out), not here.

TPU notes: attention logits are always computed and softmaxed in fp32
(``preferred_element_type``), then cast back — a superset of the reference's
``upcast_attention`` islands.  When shapes allow, the fused Pallas flash
kernel in ``ops.pallas`` is used instead of the einsum path.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from .rotary import apply_rotary, rotary_freqs

NEG_INF = float(jnp.finfo(jnp.float32).min)


def causal_mask(n: int, m: int) -> jnp.ndarray:
    """Boolean (n, m) mask, True = attend; ``tril(m - n)`` like the reference."""
    rows = jnp.arange(n)[:, None]
    cols = jnp.arange(m)[None, :]
    return cols <= rows + (m - n)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    mask: Optional[jnp.ndarray] = None,
    causal: bool = False,
    use_flash: bool = True,
) -> jnp.ndarray:
    """Multi-head attention with fp32 logits/softmax.

    q: (..., h, n, d), k/v: (..., h, m, d) — any number of leading batch dims.
    ``mask`` broadcastable to (..., h, n, m), True = attend.  ``causal=True``
    applies the tril(m-n) mask; when no explicit ``mask`` is given and the
    sequence is large enough, dispatches to the fused Pallas flash kernel.
    """
    n, m = q.shape[-2], k.shape[-2]
    if use_flash and mask is None:
        from .pallas import get_activation_mesh, maybe_shard_batched
        from .pallas.flash_attention import flash_attention, flash_attention_available

        # flash pays off only when BOTH sides are long: measured on v5e,
        # flash wins self-attn at seq>=1024 (14.4 vs 17.4 ms at the 512px L0
        # shape) but LOSES at short q (seq=256, ~2x) AND at tiny kv — the
        # 77-token text cross-attention runs 2.31 ms (einsum) vs 2.87
        # (flash) at seq 4096/d40 and 1.55 vs 2.77 at seq 1024/d80: one fat
        # batched matmul beats per-(batch*head) kernel programs when the
        # score block is skinny (tools/microbench_crossattn.py).
        # Rectangular-causal (tril(m-n)) stays on the einsum path.
        if (flash_attention_available() and n >= 512 and m >= 512
                and (not causal or n == m)):
            if get_activation_mesh() is None:
                return flash_attention(q, k, v, scale, causal)
            # multi-device mesh: the kernel must run under shard_map (axis-0
            # batch partitioning) — raw pallas_call is opaque to GSPMD.
            # Non-divisible batches fall through to the einsum path.
            out = maybe_shard_batched(
                lambda qs, ks, vs: flash_attention(qs, ks, vs, scale, causal),
                q, k, v)
            if out is not None:
                return out
    if causal and mask is None:
        mask = causal_mask(n, m)
    logits = jnp.einsum("...nd,...md->...nm", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("...nm,...md->...nd", probs, v)


def sliced_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    slice_size: int,
    causal: bool = False,
) -> jnp.ndarray:
    """Attention computed in ``slice_size`` chunks of the head axis.

    API-parity with the reference's ``set_attention_slice`` memory-saving
    path (``unet_3d_condition.py:214-277``, ``attention.py:586-620``).  On
    TPU the fused flash kernel already bounds memory (logits never hit HBM),
    so this exists for API completeness and for the einsum fallback; chunks
    are mapped sequentially with ``lax.map``.

    q/k/v: (b, h, n|m, d); ``slice_size`` divides h.
    """
    b, h, n, d = q.shape
    assert h % slice_size == 0, f"slice_size {slice_size} must divide heads {h}"
    chunks = h // slice_size

    def chunk_fn(args):
        qc, kc, vc = args
        return dot_product_attention(qc, kc, vc, scale, causal=causal,
                                     use_flash=False)

    reshape = lambda t: t.reshape(b, chunks, slice_size, t.shape[2], d).swapaxes(0, 1)  # noqa: E731
    out = jax.lax.map(chunk_fn, (reshape(q), reshape(k), reshape(v)))
    return out.swapaxes(0, 1).reshape(b, h, n, d)


def _tp_constrain(x: jnp.ndarray, model_dim: int) -> jnp.ndarray:
    """Anchor ``x``'s ``model_dim`` axis to the 'model' mesh axis.

    Under tensor parallelism the QKV projections produce 'model'-sharded
    features; without an explicit anchor GSPMD sometimes prefers an
    all-batch-sharded layout for the attention einsums and then cannot
    transition between the two efficiently ("involuntary full
    rematerialization" — it replicates the tensor mid-graph).  Every other
    axis stays UNCONSTRAINED so data/seq batch sharding propagates freely.
    No-op without a registered multi-device 'model' mesh axis or when the
    axis size does not divide the dimension.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .pallas import get_activation_mesh

    reg = get_activation_mesh()
    if reg is None:
        return x
    mesh = reg[0]
    if mesh.shape.get("model", 1) <= 1:
        return x
    if x.shape[model_dim] % mesh.shape["model"] != 0:
        return x
    spec = [P.UNCONSTRAINED] * x.ndim
    spec[model_dim] = "model"
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """(b, n, h*d) -> (b, h, n, d); head axis stays 'model'-sharded under TP."""
    b, n, hd = x.shape
    x = x.reshape(b, n, heads, hd // heads).transpose(0, 2, 1, 3)
    return _tp_constrain(x, 1)


class _DenseShellParams(nn.Module):
    """Parameter container matching ``nn.Dense``'s tree (kernel[, bias]) and
    default initializers (same path -> same init RNG draws) for paths that
    consume the raw kernels — e.g. the fused single-read QKV matmul."""

    in_features: int
    features: int
    use_bias: bool = False
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           self.param_dtype)
                if self.use_bias else None)
        return kernel, bias


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(b, h, n, d) -> (b, n, h*d); merged features stay 'model'-sharded
    under TP (to_out_0's kernel is P('model', None) — local contraction +
    one psum, the Megatron pattern)."""
    b, h, n, d = x.shape
    x = x.transpose(0, 2, 1, 3).reshape(b, n, h * d)
    return _tp_constrain(x, 2)


class CrossAttention(nn.Module):
    """Multi-head (cross-)attention; self-attention when ``context`` is None.

    Parameter names mirror the reference (``to_q/to_k/to_v/to_out_0``) for
    the torch→JAX weight converter.
    """

    query_dim: int
    cross_attention_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    bias: bool = False
    temporal: bool = False
    causal: bool = False
    inp_dim: Optional[int] = None  # FSText vision-projection variant (attention.py:341-344)
    collect_attn: bool = False  # sow attention maps (reference return_attn)
    # reference set_attention_slice (unet_3d_condition.py:214-277): compute
    # attention in `attention_slice`-head chunks.  On TPU the flash kernel
    # already bounds memory, so this is API parity for the einsum path.
    attention_slice: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        positions: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """hidden_states: (b, n, c). context: (b, m, c_ctx) or None.

        ``positions``: per-token rotary positions (n,) — required semantics
        for the SWAT path where positions come from the full-resolution
        f-major flattening; defaults to ``arange(n)``.
        """
        inner_dim = self.heads * self.dim_head
        dense = lambda feats, name, use_bias: nn.Dense(  # noqa: E731
            feats, use_bias=use_bias, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        q = dense(inner_dim, "to_q", self.bias)(hidden_states)
        ctx = hidden_states if context is None else context
        k = dense(inner_dim, "to_k", self.bias)(ctx)
        v = dense(inner_dim, "to_v", self.bias)(ctx)

        n, m = q.shape[1], k.shape[1]
        q = _split_heads(q, self.heads)
        k = _split_heads(k, self.heads)
        v = _split_heads(v, self.heads)

        if self.temporal:
            rot_dim = min(32, self.dim_head)
            if positions is None:
                positions = jnp.arange(n)
            freqs_q = rotary_freqs(positions, rot_dim)
            freqs_k = freqs_q if m == n else rotary_freqs(jnp.arange(m), rot_dim)
            q = apply_rotary(q, freqs_q)
            k = apply_rotary(k, freqs_k)

        scale = self.dim_head**-0.5
        causal = self.temporal and self.causal and mask is None
        if self.collect_attn:
            # reference return_attn path (attention.py:541-556): expose the
            # raw attention scores; forces the einsum path
            if causal and mask is None:
                mask = causal_mask(n, m)
            logits = jnp.einsum("...nd,...md->...nm", q, k,
                                preferred_element_type=jnp.float32) * scale
            if mask is not None:
                logits = jnp.where(mask, logits, NEG_INF)
            self.sow("intermediates", "attn", logits)
            probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("...nm,...md->...nd", probs, v)
        elif self.attention_slice and mask is None:
            out = sliced_attention(q, k, v, scale, self.attention_slice,
                                   causal=causal)
        else:
            out = dot_product_attention(q, k, v, scale, mask=mask, causal=causal)
        out = _merge_heads(out)
        out = dense(self.query_dim, "to_out_0", True)(out)
        # named for remat policies: saving attention outputs lets block-level
        # rematerialization skip re-running the attention kernels in backward
        return checkpoint_name(out, "attn_out")


class WindowTemporalAttention(nn.Module):
    """SWAT windowed causal spatio-temporal self-attention.

    Reference ``WindowSTempAttention`` (``seer/models/attention.py:632-703``)
    with the semantics that actually execute there (the xformers path):

    1. project q/k/v over the full f-major flattened sequence (b, f*h*w, c);
    2. apply rotary to q/k with positions = index in that flattened sequence
       (rotary *before* windowing — window tokens keep their original
       full-resolution positions);
    3. partition into ``ws×ws`` spatial windows jointly attending over all
       frames (tokens per window = f*ws², f-major order); full-frame when
       ``h <= 4``;
    4. causal = lower-triangular over the f-major window token order
       (xformers ``LowerTriangularMask`` parity, ``attention.py:626-628``) —
       every earlier frame fully visible, same-frame pixels visible up to
       own index;
    5. output projection, window-reverse back to (b, f, h, w, c).
    """

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    bias: bool = False
    causal: bool = True
    use_flash: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from .windows import select_window_size, window_partition, window_reverse

        b, f, h, w, c = x.shape
        n = f * h * w
        inner_dim = self.heads * self.dim_head
        dense = lambda feats, name, use_bias: nn.Dense(  # noqa: E731
            feats, use_bias=use_bias, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        hidden = x.reshape(b, n, c)
        from .pallas import get_activation_mesh

        if get_activation_mesh() is None:
            # Self-attention QKV as ONE matmul against the concatenated
            # kernels: three separate nn.Dense calls each stream the full
            # (b, n, c) hidden tensor from HBM; the fused form reads it
            # once (the weight concat is loop-invariant — LICM hoists it
            # out of the sampling scan).  Param tree unchanged
            # (to_q/to_k/to_v kernels), so checkpoints and the converter
            # are unaffected; the math is the same dot, column-
            # partitioned.  Under any registered mesh the separate-Dense
            # form stays: a contiguous P(None, 'model') sharding of the
            # concatenated kernel has no zero-comm split (the GEGLU
            # Megatron-layout lesson, transformer3d.py::GEGLU).
            shells = [_DenseShellParams(c, inner_dim, self.bias,
                                        self.param_dtype, name=nm)()
                      for nm in ("to_q", "to_k", "to_v")]
            ws_ = [s[0] for s in shells]
            hidden_p, *ws_ = nn.dtypes.promote_dtype(hidden, *ws_,
                                                     dtype=self.dtype)
            qkv = hidden_p @ jnp.concatenate(ws_, axis=1)
            if self.bias:
                bs_ = jnp.concatenate(
                    [s[1] for s in shells]).astype(qkv.dtype)
                qkv = qkv + bs_
            q, k, v = (_split_heads(t, self.heads)
                       for t in jnp.split(qkv, 3, axis=-1))
        else:
            q = _split_heads(dense(inner_dim, "to_q", self.bias)(hidden),
                             self.heads)
            k = _split_heads(dense(inner_dim, "to_k", self.bias)(hidden),
                             self.heads)
            v = _split_heads(dense(inner_dim, "to_v", self.bias)(hidden),
                             self.heads)

        rot_dim = min(32, self.dim_head)
        ws = select_window_size(h)
        scale = self.dim_head**-0.5

        # Rotary placement, measurement-driven (tools/probe_temporal_site.py):
        # the fused-kernel path consumes fp32 cos/sin TABLES in-kernel
        # (batch·head-invariant (f, h, w, d) arrays streamed with the window
        # BlockSpec) — the XLA pre-rotation pass re-reads and re-writes the
        # full q/k tensors and measured 2.14 ms of the 12.26 ms 512px-L0
        # temporal site.  In-kernel TRIG stays rejected (36% of kernel
        # runtime, probe r3); the tables carry the same fp32 trig the XLA
        # pass computes, so the math is unchanged.  Every non-kernel path
        # (ring, full-frame, windowed einsum) still pre-rotates in XLA.
        from .ring import ring_attention_applicable, ring_window_attention
        from .pallas.swat_attention import (swat_attention,
                                            swat_attention_available,
                                            swat_attention_tables)

        # h/w must tile exactly into ws-windows: the kernel grid is
        # (batch, h // ws) with a w // ws column loop, so a non-divisible
        # latent (e.g. resolution 288 -> h=36 at ws=8) would leave the
        # remainder rows/columns UNWRITTEN — silent garbage, unlike the
        # XLA window_partition fallback which fails loudly on reshape.
        use_tab_kernel = (ws is not None and ws >= 8 and self.use_flash
                          and h % ws == 0 and w % ws == 0
                          and swat_attention_available()
                          and not ring_attention_applicable())
        out = None
        if use_tab_kernel:
            from .pallas import get_activation_mesh, maybe_shard_batched
            from .rotary import rotary_tables

            tabs = rotary_tables(f, h, w, self.dim_head, rot_dim)
            bh = b * self.heads
            grid5 = lambda t: t.reshape(bh, f, h, w, self.dim_head)  # noqa: E731
            fn = lambda qs, ks, vs, *t_: swat_attention_tables(  # noqa: E731
                qs, ks, vs, *t_, scale, self.causal, ws)
            if get_activation_mesh() is None:
                out = fn(grid5(q), grid5(k), grid5(v), *tabs)
            else:
                # multi-device mesh: kernel under shard_map, batch·heads
                # partitioned on axis 0, tables replicated (they are
                # batch-invariant).  None = non-divisible bh: pre-rotate
                # and take the paths below.
                out = maybe_shard_batched(fn, grid5(q), grid5(k), grid5(v),
                                          replicated=tabs)
            if out is not None:
                out = out.reshape(b, self.heads, n, self.dim_head)
        if out is None:
            freqs = rotary_freqs(jnp.arange(n), rot_dim)
            q = apply_rotary(q, freqs)
            k = apply_rotary(k, freqs)
        # Under sequence parallelism (a registered mesh with a 'seq' axis)
        # this is the ONE op that needs cross-frame visibility; the ring
        # path keeps the frame axis sharded and rotates K/V blocks with
        # ppermute instead of all-gathering the full sequence onto every
        # device (ops/ring.py) — peak memory O(local block), the enabler
        # for long-rollout frame counts.  None = no seq mesh / shapes
        # don't divide: fall through to the gather-based paths below.
        if out is None and ring_attention_applicable():
            bh = b * self.heads
            grid5 = lambda t: t.reshape(bh, f, h, w, self.dim_head)  # noqa: E731
            out = ring_window_attention(
                grid5(q), grid5(k), grid5(v), scale, self.causal, ws)
            if out is not None:
                out = out.reshape(b, self.heads, n, self.dim_head)
        # measured on v5e: the fused kernel wins at ws=8 (3.0 vs 4.1 ms at
        # the 512px-L1 shape) but the XLA path edges it out at ws=4 windows
        # (2.05 vs 2.24 ms) — tiny windows amortize nothing
        if out is None and ws is not None and ws >= 8 and self.use_flash:
            from .pallas import get_activation_mesh, maybe_shard_batched
            from .pallas.swat_attention import swat_attention, swat_attention_available

            if swat_attention_available():
                # fused windowing + causal attention in one kernel; no
                # partition transposes touch HBM
                bh = b * self.heads
                grid5 = lambda t: t.reshape(bh, f, h, w, self.dim_head)  # noqa: E731
                fn = lambda qs, ks, vs: swat_attention(  # noqa: E731
                    qs, ks, vs, scale, self.causal, ws, 0)
                if get_activation_mesh() is None:
                    out = fn(grid5(q), grid5(k), grid5(v))
                else:
                    # multi-device mesh: run the kernel under shard_map
                    # (axis-0 partitioning over batch·heads); each device
                    # gets a bh-sub-range of FULL videos — the same data
                    # motion as the all-gather a seq-sharded einsum path
                    # needs, but the fused kernel stays usable.  None =
                    # non-divisible bh: take the XLA path below instead.
                    out = maybe_shard_batched(fn, grid5(q), grid5(k), grid5(v))
                if out is not None:
                    out = out.reshape(b, self.heads, n, self.dim_head)

        if out is None and ws is None:
            # full-frame: one "window" of f*h*w tokens per (batch, head)
            out = dot_product_attention(
                q, k, v, scale, causal=self.causal, use_flash=self.use_flash
            )  # (b, H, n, d)
        elif out is None:
            bh = b * self.heads
            grid = lambda t: t.reshape(bh, f, h, w, self.dim_head)  # noqa: E731
            qw = window_partition(grid(q), ws)  # (nW*bh, f*ws*ws, d)
            kw = window_partition(grid(k), ws)
            vw = window_partition(grid(v), ws)
            ow = dot_product_attention(
                qw, kw, vw, scale, causal=self.causal, use_flash=self.use_flash
            )
            out = window_reverse(ow, ws, f, h, w)  # (bh, f, h, w, d)
            out = out.reshape(b, self.heads, n, self.dim_head)

        out = _merge_heads(out)
        out = dense(self.query_dim, "to_out_0", True)(out)
        out = checkpoint_name(out, "attn_out")
        return out.reshape(b, f, h, w, self.query_dim)
