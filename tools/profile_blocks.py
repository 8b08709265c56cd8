"""Block-level TPU timing: where does a UNet forward actually spend time?

Times each block type at the hot shapes (level-0/1 of the 512px and 256px
recipes) with host-transfer sync (the axon relay's block_until_ready
returns early).  Run on the real chip:  python tools/profile_blocks.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from seervideoldm_tpu.utils.cache import enable_compilation_cache


def bench_fn(fn, *args, iters=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # sync
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    enable_compilation_cache()
    from seervideoldm_tpu.models.resnet3d import ResnetBlock3D
    from seervideoldm_tpu.models.transformer3d import SpatialTransformer3D

    dtype = jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    b, f = 2, 12  # CFG-doubled batch

    rows = []
    for (res_name, hw, ch) in [("512px-L0", 64, 320), ("512px-L1", 32, 640),
                               ("256px-L0", 32, 320), ("256px-L1", 16, 640)]:
        x = jax.random.normal(rng, (b, f, hw, hw, ch), dtype)
        temb = jax.random.normal(rng, (b, 1280), dtype)
        ctx = jax.random.normal(rng, (b, f, 77, 768), dtype)
        heads = 8

        resnet = ResnetBlock3D(in_channels=ch, out_channels=ch, temb_channels=1280,
                               dtype=dtype)
        p = resnet.init(rng, x, temb)
        t_res = bench_fn(jax.jit(lambda p, x, e: resnet.apply(p, x, e)), p, x, temb)

        text_attn = SpatialTransformer3D(ch, heads, ch // heads, depth=1,
                                         context_dim=768, text_frame_condition=True,
                                         dtype=dtype)
        p = text_attn.init(rng, x, ctx)
        t_text = bench_fn(jax.jit(lambda p, x, c: text_attn.apply(p, x, c)), p, x, ctx)

        temp_attn = SpatialTransformer3D(ch, heads, ch // heads, depth=1,
                                         temporal=True, causal=True, dtype=dtype)
        p = temp_attn.init(rng, x)
        t_temp = bench_fn(jax.jit(lambda p, x: temp_attn.apply(p, x)), p, x)

        rows.append((res_name, hw, ch, t_res, t_text, t_temp))
        print(f"{res_name} (hw={hw}, ch={ch}): resnet {t_res*1e3:.1f} ms | "
              f"text-attn {t_text*1e3:.1f} ms | temporal-attn {t_temp*1e3:.1f} ms",
              flush=True)

    print("\nper-UNet-forward rough totals (x num layers at each level):")
    for name, hw, ch, a, b_, c in rows:
        print(f"  {name}: triplet {1e3*(a+b_+c):.1f} ms")


if __name__ == "__main__":
    main()
