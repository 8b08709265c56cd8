"""FreeU (ops/freeu.py) — Fourier filter semantics, UNet integration, and
config plumbing."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seervideoldm_tpu.ops.freeu import apply_freeu, fourier_filter


def test_fourier_filter_scale_one_is_identity():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8, 4))
    np.testing.assert_allclose(np.asarray(fourier_filter(x, 1, 1.0)),
                               np.asarray(x), atol=1e-5)


def test_fourier_filter_scales_dc_component():
    """A constant image is pure DC: the filter multiplies it by scale."""
    x = jnp.full((1, 1, 8, 8, 2), 3.0)
    out = fourier_filter(x, threshold=1, scale=0.5)
    np.testing.assert_allclose(np.asarray(out), 1.5, atol=1e-5)


def test_fourier_filter_preserves_nyquist():
    """A Nyquist-frequency checkerboard has no energy near DC: unchanged."""
    i = jnp.arange(8)
    checker = ((i[:, None] + i[None, :]) % 2 * 2.0 - 1.0)
    x = checker[None, None, :, :, None]
    out = fourier_filter(x, threshold=1, scale=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_apply_freeu_backbone_half_scaling():
    h = jnp.ones((1, 2, 4, 4, 8))
    skip = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 4, 4, 8))
    out_h, out_s = apply_freeu(h, skip, b=2.0, s=1.0)
    np.testing.assert_allclose(np.asarray(out_h[..., :4]), 2.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_h[..., 4:]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(skip), atol=1e-5)


@pytest.mark.slow
def test_unet_freeu_off_is_parity_and_on_differs():
    from seervideoldm_tpu.models.unet3d import SeerUNet, SeerUNetConfig

    base_cfg = SeerUNetConfig(block_out_channels=(16, 32), layers_per_block=1,
                              norm_num_groups=8, cross_attention_dim=16,
                              attention_head_dim=4)
    unet = SeerUNet(config=base_cfg)
    b, f, s = 1, 2, 8
    x = jax.random.normal(jax.random.PRNGKey(2), (b, f, s, s, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(3), (b, f, 7, 16))
    ts = jnp.array([3], jnp.int32)
    params = unet.init(jax.random.PRNGKey(4), x, ts, ctx, 0)["params"]
    baseline = unet.apply({"params": params}, x, ts, ctx, 0)

    import dataclasses

    on = SeerUNet(config=dataclasses.replace(
        base_cfg, freeu=(1.5, 1.6, 0.9, 0.2)))
    out = jax.jit(lambda p: on.apply({"params": p}, x, ts, ctx, 0))(params)
    assert out.shape == baseline.shape
    assert np.isfinite(np.asarray(out)).all()
    assert not np.allclose(np.asarray(out), np.asarray(baseline))
    # neutral parameters (b=1, s=1) reproduce the baseline exactly modulo
    # the fp32 FFT round-trip
    neutral = SeerUNet(config=dataclasses.replace(
        base_cfg, freeu=(1.0, 1.0, 1.0, 1.0)))
    np.testing.assert_allclose(
        np.asarray(neutral.apply({"params": params}, x, ts, ctx, 0)),
        np.asarray(baseline), atol=1e-4,
    )


@pytest.mark.slow
def test_config_validation_and_injection():
    from seervideoldm_tpu.config import Config, validate

    cfg = Config()
    cfg.freeu = [1.5, 1.6, 0.9, 0.2]
    validate(cfg)
    cfg.freeu = [1.5, 1.6]
    with pytest.raises(ValueError, match="freeu"):
        validate(cfg)
    cfg.freeu = [1.5, 1.6, 0.9, -0.2]
    with pytest.raises(ValueError, match="freeu"):
        validate(cfg)

    from seervideoldm_tpu.pipelines.loading import load_models

    cfg = Config()
    cfg.freeu = [1.5, 1.6, 0.9, 0.2]
    cfg.model_overrides = {
        "unet": dict(block_out_channels=[8, 16], layers_per_block=1,
                     norm_num_groups=4, cross_attention_dim=8,
                     attention_head_dim=2),
        "vae": dict(block_out_channels=[8, 8], layers_per_block=1,
                    norm_num_groups=4),
        "clip": dict(hidden_size=8, intermediate_size=16, num_hidden_layers=1,
                     num_attention_heads=2),
        "fstext": dict(n_heads=2, num_layers=1),
    }
    cfg.resolution = 32
    cfg.num_frames = 2
    models, _ = load_models(cfg, jax.random.PRNGKey(0))
    assert models.unet.config.freeu == (1.5, 1.6, 0.9, 0.2)

    # explicit freeu: None in model_overrides.unet disables injection
    cfg.model_overrides["unet"]["freeu"] = None
    models, _ = load_models(cfg, jax.random.PRNGKey(0))
    assert models.unet.config.freeu is None

    # bool sneaking through as 1 is rejected by validation
    from seervideoldm_tpu.config import validate as _validate
    cfg2 = Config()
    cfg2.freeu = [True, 1.6, 0.9, 0.2]
    with pytest.raises(ValueError, match="freeu"):
        _validate(cfg2)
    cfg2.freeu = [1.5, 1.6, 0.9, 1e6]
    with pytest.raises(ValueError, match="freeu"):
        _validate(cfg2)
