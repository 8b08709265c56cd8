"""Block-level TPU timing: where does a UNet forward actually spend time?

The axon relay adds ~hundreds of ms of per-dispatch overhead, so each block
is timed as a single-dispatch ``lax.scan`` of N applications (overhead
amortized to noise).  Run:  python tools/profile_blocks.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from seervideoldm_tpu.utils.cache import enable_compilation_cache

N_INNER = 20


def bench_scan(apply_fn, params, x, *extra, iters=3):
    """Median seconds per single application, amortized over N_INNER."""

    @jax.jit
    def scanned(params, x):
        def body(h, _):
            out = apply_fn(params, h, *extra)
            # keep carry shape: blocks are shape-preserving here
            return out.astype(h.dtype), ()

        h, _ = jax.lax.scan(body, x, None, length=N_INNER)
        # reduce on-device: host transfers ride a slow relay tunnel, so only
        # a scalar may cross for the timing sync
        return jnp.sum(h.astype(jnp.float32))

    out = scanned(params, x)
    float(out)  # sync
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(scanned(params, x))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) / N_INNER


def main():
    enable_compilation_cache()
    from seervideoldm_tpu.models.resnet3d import ResnetBlock3D
    from seervideoldm_tpu.models.transformer3d import SpatialTransformer3D

    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    b, f = 2, 12  # CFG-doubled batch

    layer_counts = {  # triplets per level in a full forward (down+up)
        "L0": 5, "L1": 5,
    }
    for (res_name, hw, ch) in [("512px-L0", 64, 320), ("512px-L1", 32, 640),
                               ("512px-L2", 16, 1280), ("512px-L3", 8, 1280),
                               ("256px-L0", 32, 320), ("256px-L1", 16, 640)]:
        x = jax.random.normal(rng, (b, f, hw, hw, ch), dtype)
        temb = jax.random.normal(rng, (b, 1280), dtype)
        ctx = jax.random.normal(rng, (b, f, 77, 768), dtype)
        heads = 8

        resnet = ResnetBlock3D(in_channels=ch, out_channels=ch, temb_channels=1280,
                               dtype=dtype)
        p = resnet.init(rng, x, temb)
        t_res = bench_scan(lambda p, x: resnet.apply(p, x, temb), p, x)

        text_attn = SpatialTransformer3D(ch, heads, ch // heads, depth=1,
                                         context_dim=768, text_frame_condition=True,
                                         dtype=dtype)
        p = text_attn.init(rng, x, ctx)
        t_text = bench_scan(lambda p, x: text_attn.apply(p, x, ctx), p, x)

        temp_attn = SpatialTransformer3D(ch, heads, ch // heads, depth=1,
                                         temporal=True, causal=True, dtype=dtype)
        p = temp_attn.init(rng, x)
        t_temp = bench_scan(lambda p, x: temp_attn.apply(p, x), p, x)

        print(f"{res_name} (hw={hw}, ch={ch}): resnet {t_res*1e3:.2f} ms | "
              f"text-attn {t_text*1e3:.2f} ms | temporal-attn {t_temp*1e3:.2f} ms | "
              f"triplet {1e3*(t_res+t_text+t_temp):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
