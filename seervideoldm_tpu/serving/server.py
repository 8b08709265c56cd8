"""HTTP serving for image+text → video generation.

Production-shaped inference front end (no reference equivalent — the
reference stops at batch scripts): a ``GenerationService`` owns the jitted
``SeerPipeline`` and pads dynamic request groups to ONE static batch shape,
so the TPU executable compiles exactly once and every request rides a full
MXU-efficient batch; ``DynamicBatcher`` forms the groups.  The HTTP layer
is a stdlib ``ThreadingHTTPServer`` — zero extra dependencies.

API:
  GET  /healthz             -> {"ok": true, "batches": N, "requests": M}
  POST /generate            body: {"prompt": str, "image": base64 png/jpeg}
                            -> image/gif (cond frames + generated frames)

With ``total_frames`` configured the server runs the autoregressive
long-video rollout per batch (``pipelines/text_video.py::generate_rollout``)
and the ``prompt`` may chain per-chunk instructions with ``"|"``
(``"pick up the cup | pour it | put it down"``).
"""
from __future__ import annotations

import base64
import io
import json
import threading
from dataclasses import dataclass
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import numpy as np

from ..data.transforms import image_to_model_input
from ..utils.viz import gif_bytes
from .batcher import BatcherOverloaded, DynamicBatcher


@dataclass
class GenRequest:
    prompt: str
    image: np.ndarray  # (res, res, 3) float32 in [-1, 1]
    # CFG negative direction (beyond reference, standard diffusion practice):
    # the unconditional CLIP embedding comes from this text instead of ""
    negative_prompt: str = ""


class GenerationService:
    """Batched generation: pad each request group to the compiled batch."""

    def __init__(self, pipe, tokenizer, *, resolution: int, cond_frames: int,
                 num_frames: int, ddim_steps: int, guidance_scale: float,
                 sampler: str = "ddim", max_batch: int = 4,
                 max_wait_ms: float = 100.0, seed: int = 0,
                 sampling_kwargs: dict | None = None,
                 total_frames: int | None = None):
        self.pipe = pipe
        self.tokenizer = tokenizer
        self.resolution = resolution
        self.cond_frames = cond_frames
        self.num_frames = num_frames
        self.ddim_steps = ddim_steps
        self.guidance_scale = guidance_scale
        # extra per-call sampler knobs (config.sampling_kwargs_from shape:
        # guidance_interval / prediction_type / pab_config / timestep_spacing
        # / guidance_rescale ...); the dict's sampler wins over the sampler=
        # arg, which is only the fallback when the dict omits it
        self.sampling_kwargs = dict(sampling_kwargs or {})
        self.sampling_kwargs.setdefault("sampler", sampler)
        # autoregressive long-video rollout (pipeline generate_rollout):
        # server-wide so every request in a padded batch shares one chunk
        # count (a per-request length would fracture the compiled batch).
        # Prompts may chain per-chunk instructions with "|".
        self.total_frames = int(total_frames) if total_frames else None
        if self.total_frames and num_frames - cond_frames < 1:
            raise ValueError("total_frames rollout needs num_frames > cond_frames")
        self.max_batch = max_batch
        self._rng = jax.random.PRNGKey(seed)
        self._counter = 0
        self._lock = threading.Lock()
        # end-to-end request latency (queue wait + sampling), last 256
        from collections import deque

        self._latencies: "deque[float]" = deque(maxlen=256)
        # constant across batches — don't retokenize in the hot path
        self._tok_uc = tokenizer([""] * max_batch)
        self.batcher = DynamicBatcher(self._handle_batch, max_batch,
                                      max_wait_ms).start()

    def preprocess_image(self, data: bytes) -> np.ndarray:
        from PIL import Image

        with Image.open(io.BytesIO(data)) as img:
            return image_to_model_input(img, self.resolution)

    def generate(self, prompt: str, image_bytes: bytes,
                 negative_prompt: str = "",
                 timeout_s: float = 600.0) -> np.ndarray:
        """Blocking single-request API: returns (f, h, w, 3) video in [0,1]
        (cond frames prepended, the reference inference_img layout)."""
        return self.generate_array(prompt, self.preprocess_image(image_bytes),
                                   negative_prompt, timeout_s)

    def generate_array(self, prompt: str, image: np.ndarray,
                       negative_prompt: str = "",
                       timeout_s: float = 600.0) -> np.ndarray:
        """As ``generate`` but with a preprocessed (res, res, 3) [-1,1] array
        — lets the HTTP layer decode/validate the image in its own error
        class (bad image = client 400, not a server 500)."""
        import time

        req = GenRequest(prompt=prompt, image=image,
                         negative_prompt=negative_prompt)
        t0 = time.monotonic()
        result = self.batcher.submit(req).result(timeout=timeout_s)
        self._latencies.append(time.monotonic() - t0)
        return result

    def stats(self) -> dict:
        lat = sorted(self._latencies)
        pct = (lambda p: round(lat[min(len(lat) - 1,
                                       int(p * len(lat)))], 3)) if lat else None
        return {
            "ok": True,
            "batches": self.batcher.batches,
            "requests": self.batcher.requests,
            "latency_p50_s": pct(0.50) if lat else None,
            "latency_p95_s": pct(0.95) if lat else None,
        }

    def _handle_batch(self, reqs) -> list:
        n = len(reqs)
        # pad to the ONE compiled batch shape: row 0 repeated, sliced off
        # after sampling — a new batch size would otherwise recompile the
        # whole sampler executable per distinct group size
        frames = np.stack([r.image for r in reqs]
                          + [reqs[0].image] * (self.max_batch - n))
        cond = frames[:, None].repeat(self.cond_frames, axis=1)
        prompts = [r.prompt for r in reqs] + [""] * (self.max_batch - n)
        negs = [r.negative_prompt for r in reqs] + [""] * (self.max_batch - n)
        tok_uc = self.tokenizer(negs) if any(negs) else self._tok_uc
        with self._lock:
            rng = jax.random.fold_in(self._rng, self._counter)
            self._counter += 1
        common = dict(
            num_frames=self.num_frames, rng=rng,
            ddim_steps=self.ddim_steps, guidance_scale=self.guidance_scale,
            **self.sampling_kwargs,
        )
        if self.total_frames:
            # rollout: each request may chain per-chunk instructions with
            # "|"; chains are padded with their last entry (or truncated) to
            # the server's fixed chunk count, then tokenized per chunk
            f2 = self.num_frames - self.cond_frames
            n_chunks = -(-self.total_frames // f2)
            chains = [
                [s.strip() for s in p.split("|") if s.strip()] or [""]
                for p in prompts
            ]
            chains = [(c + [c[-1]] * n_chunks)[:n_chunks] for c in chains]
            prompts_tok = [self.tokenizer([c[i] for c in chains])
                           for i in range(n_chunks)]
            videos = self.pipe.generate_rollout(
                cond, prompts_tok,
                tok_uc["input_ids"], tok_uc["attention_mask"],
                total_frames=self.total_frames, **common,
            )
        else:
            tok = self.tokenizer(prompts)
            videos = self.pipe.generate(
                cond, tok["input_ids"], tok["attention_mask"],
                tok_uc["input_ids"], tok_uc["attention_mask"],
                **common,
            )
        videos = np.asarray(videos)  # (B, f2, h, w, 3) in [0, 1]
        cond01 = (cond + 1.0) / 2.0
        return [np.concatenate([cond01[i], videos[i]], axis=0)
                for i in range(n)]

    def warmup(self) -> None:
        """Compile the padded-batch executable before accepting traffic —
        the first real request otherwise pays the full jit compile."""
        dummy = GenRequest(prompt="", image=np.zeros(
            (self.resolution, self.resolution, 3), np.float32))
        self._handle_batch([dummy])

    def stop(self) -> None:
        self.batcher.stop()


class _Handler(BaseHTTPRequestHandler):
    service: GenerationService  # set by make_server

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _send(self, code: int, body: bytes, ctype: str) -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _send_json(self, code: int, obj) -> None:
        self._send(code, json.dumps(obj).encode(), "application/json")

    def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler API
        if self.path == "/healthz":
            self._send_json(200, self.service.stats())
        else:
            self._send_json(404, {"error": "not found"})

    def do_POST(self):  # noqa: N802
        if self.path != "/generate":
            self._send_json(404, {"error": "not found"})
            return
        length = int(self.headers.get("Content-Length", 0) or 0)
        if length > 32 * 1024 * 1024:
            # never buffer a client-declared multi-GB body
            self._send_json(413, {"error": f"body too large ({length} bytes)"})
            return
        try:
            payload = json.loads(self.rfile.read(length))
            prompt = payload.get("prompt", "")
            negative = payload.get("negative_prompt", "")
            if not isinstance(prompt, str) or not isinstance(negative, str):
                raise ValueError("prompt/negative_prompt must be strings")
            # tolerate line-wrapped base64 (`base64` without -w0), but
            # validate the rest — silent char-dropping hides corrupt payloads
            image_b64 = "".join(payload["image"].split())
            image_bytes = base64.b64decode(image_b64, validate=True)
            # decode HERE so undecodable image bytes are a 400, not a 500
            image = self.service.preprocess_image(image_bytes)
        except Exception as exc:  # noqa: BLE001 — ANY malformed payload is a
            # client error (non-dict JSON, non-str image, bad b64, corrupt
            # image, ...): a narrower catch would drop the connection or
            # misreport client garbage as a server failure
            self._send_json(400, {"error": f"bad request: {exc}"})
            return
        try:
            video = self.service.generate_array(prompt, image,
                                                negative_prompt=negative)
        except BatcherOverloaded as exc:
            self._send_json(503, {"error": f"overloaded: {exc}"})
            return
        except Exception as exc:  # noqa: BLE001 — request-scoped failure
            self._send_json(500, {"error": str(exc)})
            return
        self._send(200, gif_bytes(video), "image/gif")


def make_server(service: GenerationService, host: str = "127.0.0.1",
                port: int = 8000) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server; caller runs serve_forever()."""
    handler = type("BoundHandler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)
