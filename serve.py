"""Batched HTTP serving of image+text → video generation.

Beyond-reference production surface (the reference stops at batch
scripts).  Usage::

    python serve.py --config ./configs/inference_base.yaml \
        --set serve_port=8000 --set serve_max_batch=4

Then::

    curl -s localhost:8000/generate -d '{"prompt": "push the cup left",
        "image": "<base64 png/jpeg>"}' -o clip.gif

Requests are dynamically batched and padded to ONE compiled batch shape
(``serve_max_batch``), so the sampler executable compiles once at startup
(warmup) and every request rides a full batch; sampling knobs
(``ddim_steps``, ``scale``, ``sampler``, ``num_frames``) are fixed per
server instance to keep the executable static.
"""
from __future__ import annotations

import jax

from seervideoldm_tpu.config import (
    parse_args,
    sampler_schedule_from,
    sampling_kwargs_from,
)
from seervideoldm_tpu.parallel.mesh import create_mesh
from seervideoldm_tpu.pipelines.loading import (
    load_finetuned,
    load_models,
    resolve_finetuned_dir,
)
from seervideoldm_tpu.pipelines.text_video import SeerPipeline
from seervideoldm_tpu.serving import GenerationService, make_server


def main() -> None:
    from seervideoldm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = parse_args("Seer TPU serving")
    rng = jax.random.PRNGKey(cfg.seed)

    mesh = create_mesh(cfg.mesh_shape) if cfg.mesh_shape else None
    models, tokenizer = load_models(cfg, rng, mesh=mesh)
    ckpt_dir = resolve_finetuned_dir(cfg)
    if ckpt_dir:
        models = load_finetuned(models, ckpt_dir)
    pipe = SeerPipeline(models, mesh=mesh,
                        schedule=sampler_schedule_from(cfg),
                        donate_latents=bool(cfg.donate_latents),
                        vae_scale=float(cfg.vae_scale))

    service = GenerationService(
        pipe, tokenizer, resolution=cfg.resolution,
        cond_frames=cfg.cond_frames, num_frames=cfg.num_frames,
        ddim_steps=cfg.ddim_steps, guidance_scale=cfg.scale,
        max_batch=int(cfg.serve_max_batch),
        max_wait_ms=float(cfg.serve_max_wait_ms), seed=cfg.seed,
        sampling_kwargs=sampling_kwargs_from(cfg),
        # long-video rollout (server-wide so the batch shares one chunk
        # count); request prompts may chain per-chunk instructions with "|"
        total_frames=(int(cfg.total_frames) if cfg.get("total_frames")
                      else None),
    )
    print("warmup: compiling the padded-batch executable ...", flush=True)
    service.warmup()
    server = make_server(service, host=cfg.serve_host, port=int(cfg.serve_port))
    print(f"serving on http://{cfg.serve_host}:{server.server_address[1]} "
          f"(max_batch={cfg.serve_max_batch}, steps={cfg.ddim_steps}, "
          f"sampler={cfg.sampler})", flush=True)
    import signal

    def _sigterm(*_a):
        # systemd/k8s stop: unwind like Ctrl-C so sockets/threads close
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _sigterm)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        server.server_close()
        service.stop()


if __name__ == "__main__":
    main()
