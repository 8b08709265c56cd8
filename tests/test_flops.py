"""Analytic FLOP counter sanity: against XLA's HLO cost model + scaling laws."""
import jax
import jax.numpy as jnp
import numpy as np

from seervideoldm_tpu.utils.flops import (
    UNetShape,
    sampling_clip_flops,
    seer_unet_flops,
    vae_flops,
)


def test_unet_flops_bracket_xla_cost_model():
    """Matmul/conv-only analytic count must be <= XLA's pre-optimization
    flops (which add elementwise/softmax work) but within 2x of it."""
    from seervideoldm_tpu.models.unet3d import SeerUNet, SeerUNetConfig
    import seervideoldm_tpu.ops.pallas.flash_attention as fa
    import seervideoldm_tpu.ops.pallas.swat_attention as sw

    cfg = SeerUNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                         norm_num_groups=8, cross_attention_dim=32,
                         attention_head_dim=4)
    unet = SeerUNet(config=cfg)
    b, f, h = 2, 4, 16
    shapes = jax.eval_shape(
        lambda k: unet.init(k, jnp.zeros((b, f, h, h, 4)),
                            jnp.zeros((b,), jnp.int32),
                            jnp.zeros((b, f, 77, 32)), 0),
        jax.random.PRNGKey(0),
    )["params"]
    abstract = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), shapes)

    def fwd(params, x, t, ctx):
        return unet.apply({"params": params}, x, t, ctx, 0)

    fa._DISABLE = sw._DISABLE = True  # einsum path: countable by the cost model
    try:
        lowered = jax.jit(fwd).lower(
            abstract, jax.ShapeDtypeStruct((b, f, h, h, 4), jnp.float32),
            jax.ShapeDtypeStruct((b,), jnp.int32),
            jax.ShapeDtypeStruct((b, f, 77, 32), jnp.float32),
        )
        xla_flops = float(lowered.cost_analysis().get("flops", 0.0))
    finally:
        fa._DISABLE = sw._DISABLE = False
    analytic = seer_unet_flops(UNetShape(b=b, f=f, h=h, w=h, ctx_dim=32), cfg)
    assert analytic <= xla_flops * 1.05, (analytic, xla_flops)
    assert analytic >= xla_flops * 0.5, (analytic, xla_flops)


def test_unet_flops_scaling():
    base = seer_unet_flops(UNetShape(b=1, f=12, h=64, w=64))
    double_b = seer_unet_flops(UNetShape(b=2, f=12, h=64, w=64))
    np.testing.assert_allclose(double_b / base, 2.0, rtol=1e-6)
    # frames: conv/FF linear in f, SWAT quadratic — between 2x and 4x
    double_f = seer_unet_flops(UNetShape(b=1, f=24, h=64, w=64))
    assert 2.0 < double_f / base < 4.0


def test_full_scale_totals_plausible():
    """512px DDIM-50 CFG clip ~1.3 PFLOP; the SD-1.5 2D UNet share of one
    call matches the published ~0.8 TFLOP/image at 64x64 latents within 2x."""
    out = sampling_clip_flops(1, 12, 2, 512, 50, cfg=True, include_vae=True)
    assert 0.5e15 < out["ddim_total"] < 3e15
    per_image = out["unet_per_call"] / (2 * 12)
    assert 0.4e12 < per_image < 1.6e12
    # VAE decode of one 512px frame is ~2.5 TFLOP published; 10 frames here
    assert 1.5e12 < out["vae_decode"] / 10 < 4e12


def test_vae_flops_encode_decode_ratio():
    enc = vae_flops(1, 256, 256, decode=False)
    dec = vae_flops(1, 32, 32, decode=True)
    # decoder has 3 resnets/block at full res — known ~2-4x encoder cost
    assert 1.5 < dec / enc < 5.0
