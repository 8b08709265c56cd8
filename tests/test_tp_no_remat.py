"""TP sharding hygiene: compiling the DDIM sampler over a tensor-parallel
mesh must not trigger GSPMD "Involuntary full rematerialization" — the
compiler's bail-out that replicates a tensor mid-graph to move between
shardings.  Round-3 dryruns were full of these on the attention head
split/merge (`ops/attention.py::_tp_constrain`) and the fused GEGLU
projection (`models/transformer3d.py::GEGLU`); each one is a silent
throughput tax on real multi-chip hardware.

Runs as a subprocess so the C++ SPMD partitioner's stderr (glog) can be
captured and grepped, exactly like the driver's dryrun log.
"""
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = textwrap.dedent("""
    import os
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax, jax.numpy as jnp, numpy as np
    jax.config.update("jax_platforms", "cpu")

    from seervideoldm_tpu.models.clip_text import CLIPTextConfig
    from seervideoldm_tpu.models.unet3d import SeerUNetConfig
    from seervideoldm_tpu.models.vae import VAEConfig
    from seervideoldm_tpu.parallel.mesh import (
        batch_sharding, create_mesh, video_sharding)
    from seervideoldm_tpu.parallel.sharding import shard_params
    from seervideoldm_tpu.pipelines.text_video import SeerModels
    from seervideoldm_tpu.diffusion.ddim import ddim_sample_loop
    from seervideoldm_tpu.diffusion.schedules import DiffusionSchedule
    from seervideoldm_tpu.ops.pallas import set_activation_mesh

    mesh = create_mesh({"data": 2, "model": 2, "seq": 2})
    models = SeerModels.initialize(
        jax.random.PRNGKey(0), num_frames=4,
        unet_config=SeerUNetConfig(
            block_out_channels=(32, 64), layers_per_block=1,
            norm_num_groups=8, cross_attention_dim=32, attention_head_dim=4),
        vae_config=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                             norm_num_groups=8),
        clip_config=CLIPTextConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=16),
        fstext_kwargs=dict(n_heads=4, num_layers=1),
        dtype=jnp.float32, latent_size=8)
    models.unet = models.unet.clone(activation_sharding=video_sharding(mesh))
    set_activation_mesh(mesh)
    models.unet_params = shard_params(models.unet_params, mesh)
    models.fstext_params = shard_params(models.fstext_params, mesh)

    b, f, f1 = 2, 4, 1
    tables = DiffusionSchedule.create(1000).ddim_tables(2, eta=0.0)
    clip_emb = jax.device_put(
        jnp.asarray(np.random.RandomState(0).randn(b, 16, 32), jnp.float32),
        batch_sharding(mesh, 3))
    x0_emb = jax.device_put(
        jnp.asarray(np.random.RandomState(1).randn(b, f1, 8, 8, 4),
                    jnp.float32), batch_sharding(mesh, 5))
    x_T = jax.device_put(
        jnp.asarray(np.random.RandomState(2).randn(b, f - f1, 8, 8, 4),
                    jnp.float32), batch_sharding(mesh, 5))

    def sample(unet_params, fstext_params, x_T, x0_emb, clip_emb):
        context = models.fstext.apply({"params": fstext_params}, clip_emb)
        uncond = jnp.broadcast_to(
            clip_emb[:, None], (clip_emb.shape[0], f, *clip_emb.shape[1:]))
        def unet_apply(x, t, ctx, cf):
            return models.unet.apply({"params": unet_params}, x, t, ctx, cf)
        return ddim_sample_loop(unet_apply, x_T, tables, context,
                                x0_emb=x0_emb, uncond_context=uncond,
                                guidance_scale=7.5)

    out = jax.jit(sample)(models.unet_params, models.fstext_params,
                          x_T, x0_emb, clip_emb)
    print("SAMPLE_OK", out.shape, float(np.asarray(out).std()))
""")


@pytest.mark.slow
def test_tp_sampler_compiles_without_involuntary_remat(tmp_path):
    script = tmp_path / "tp_compile_probe.py"
    script.write_text(_SCRIPT)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["TF_CPP_MIN_LOG_LEVEL"] = "0"  # keep glog warnings visible
    env["JAX_CACHE_DIR"] = "/tmp/jax_test_cache"
    proc = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True,
        timeout=1200, cwd=REPO, env=env)
    assert proc.returncode == 0, f"probe failed:\n{proc.stdout}\n{proc.stderr}"
    # non-vacuous: the probe really sampled on the 3-axis mesh
    assert "SAMPLE_OK" in proc.stdout
    bad = [l for l in proc.stderr.splitlines()
           if "Involuntary full rematerialization" in l]
    assert not bad, (
        f"{len(bad)} involuntary GSPMD remats on the TP path:\n"
        + "\n".join(bad[:8]))
