"""Serving subsystem: dynamic batcher semantics + HTTP e2e on tiny models.

Beyond-reference surface (the reference has no serving path): requests are
padded to one compiled batch shape and grouped by a single-worker batcher.
"""
import base64
import io
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from seervideoldm_tpu.serving.batcher import DynamicBatcher


# --- batcher unit tests (no models) ---

def test_batcher_groups_and_orders():
    sizes = []

    def handler(items):
        sizes.append(len(items))
        return [x * 10 for x in items]

    b = DynamicBatcher(handler, max_batch=2, max_wait_ms=500).start()
    futs = [b.submit(i) for i in range(4)]
    assert [f.result(timeout=10) for f in futs] == [0, 10, 20, 30]
    b.stop()
    assert sum(sizes) == 4
    assert b.requests == 4
    # with a 500 ms window and instant submissions, at least one group forms
    assert b.batches <= 3 and max(sizes) == 2


def test_batcher_error_propagates_to_all():
    def handler(items):
        raise RuntimeError("boom")

    b = DynamicBatcher(handler, max_batch=4, max_wait_ms=50).start()
    futs = [b.submit(i) for i in range(2)]
    for f in futs:
        with pytest.raises(RuntimeError, match="boom"):
            f.result(timeout=10)
    b.stop()


def test_batcher_result_count_mismatch_is_an_error():
    b = DynamicBatcher(lambda items: [1], max_batch=2, max_wait_ms=200).start()
    futs = [b.submit(i) for i in range(2)]
    errs = 0
    for f in futs:
        try:
            f.result(timeout=10)
        except RuntimeError:
            errs += 1
    assert errs == 2
    b.stop()


def test_batcher_overload_sheds_requests():
    import threading

    gate = threading.Event()
    entered = threading.Event()

    def handler(items):
        entered.set()  # item 0 is out of the queue once this fires
        gate.wait(10)
        return items

    from seervideoldm_tpu.serving.batcher import BatcherOverloaded

    b = DynamicBatcher(handler, max_batch=1, max_wait_ms=1, max_queue=2).start()
    first = b.submit(0)  # occupies the worker (blocked on gate)
    assert entered.wait(10)
    b.submit(1), b.submit(2)  # fill the queue
    with pytest.raises(BatcherOverloaded):
        b.submit(3)
    gate.set()
    assert first.result(timeout=10) == 0
    b.stop()


def test_batcher_submit_after_stop_raises():
    b = DynamicBatcher(lambda items: items, max_batch=1, max_wait_ms=10).start()
    b.stop()
    with pytest.raises(RuntimeError, match="not started"):
        b.submit(1)


# --- service + HTTP e2e on tiny models ---

@pytest.fixture(scope="module")
def service():
    from seervideoldm_tpu.models.clip_text import CLIPTextConfig
    from seervideoldm_tpu.models.unet3d import SeerUNetConfig
    from seervideoldm_tpu.models.vae import VAEConfig
    from seervideoldm_tpu.pipelines.text_video import SeerModels, SeerPipeline
    from seervideoldm_tpu.serving import GenerationService
    from seervideoldm_tpu.utils.tokenizer import DebugTokenizer

    models = SeerModels.initialize(
        jax.random.PRNGKey(0), num_frames=4,
        unet_config=SeerUNetConfig(
            block_out_channels=(32, 64), layers_per_block=1, norm_num_groups=8,
            cross_attention_dim=32, attention_head_dim=4,
        ),
        vae_config=VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                             norm_num_groups=8),
        clip_config=CLIPTextConfig(vocab_size=100, hidden_size=32,
                                   intermediate_size=64, num_hidden_layers=2,
                                   num_attention_heads=4,
                                   max_position_embeddings=16),
        fstext_kwargs=dict(n_heads=4, num_layers=1),
        dtype=jnp.float32, latent_size=8,
    )
    svc = GenerationService(
        SeerPipeline(models), DebugTokenizer(vocab_size=100, max_length=16),
        resolution=16, cond_frames=1, num_frames=4, ddim_steps=2,
        guidance_scale=7.5, max_batch=2, max_wait_ms=100.0, seed=0,
    )
    yield svc
    svc.stop()


@pytest.mark.slow
def test_service_on_data_mesh(service):
    """Serving composes with multi-chip sampling: the padded batch shards
    over a data mesh (production deployment shape)."""
    from seervideoldm_tpu.parallel.mesh import create_mesh
    from seervideoldm_tpu.pipelines.text_video import SeerPipeline
    from seervideoldm_tpu.serving import GenerationService

    mesh = create_mesh({"data": 2})
    svc = GenerationService(
        SeerPipeline(service.pipe.m, mesh=mesh), service.tokenizer,
        resolution=16, cond_frames=1, num_frames=4, ddim_steps=2,
        guidance_scale=7.5, max_batch=2, max_wait_ms=50.0, seed=0,
    )
    try:
        video = svc.generate("push", _png_bytes())
        assert video.shape == (4, 16, 16, 3) and np.isfinite(video).all()
    finally:
        svc.stop()


@pytest.mark.slow
def test_service_rollout(service):
    """total_frames > num_frames - cond_frames runs the autoregressive
    rollout per batch; '|'-chained prompts map one instruction per chunk
    and short chains repeat their last entry."""
    from seervideoldm_tpu.serving import GenerationService

    svc = GenerationService(
        service.pipe, service.tokenizer,
        resolution=16, cond_frames=1, num_frames=4, ddim_steps=2,
        guidance_scale=7.5, max_batch=2, max_wait_ms=50.0, seed=0,
        total_frames=7,  # f2=3 -> 3 chunks (ceil), last chunk cropped
    )
    try:
        video = svc.generate("pick | pour | place", _png_bytes())
        # cond frame + total_frames rollout frames
        assert video.shape == (1 + 7, 16, 16, 3) and np.isfinite(video).all()
        # a single-instruction prompt repeats across chunks (no error)
        video2 = svc.generate("push", _png_bytes(1))
        assert video2.shape == (8, 16, 16, 3)
    finally:
        svc.stop()


def test_service_rollout_rejects_bad_window():
    from seervideoldm_tpu.serving import GenerationService

    with pytest.raises(ValueError, match="num_frames > cond_frames"):
        GenerationService(None, None, resolution=16, cond_frames=4,
                          num_frames=4, ddim_steps=2, guidance_scale=7.5,
                          total_frames=8)


def _png_bytes(seed: int = 0, size: int = 24) -> bytes:
    from PIL import Image

    arr = np.random.RandomState(seed).randint(0, 255, (size, size, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def test_service_generate(service):
    video = service.generate("push the cup left", _png_bytes())
    assert video.shape == (4, 16, 16, 3)  # cond frame + 3 generated
    assert np.isfinite(video).all() and video.min() >= 0.0 and video.max() <= 1.0


def test_negative_prompt_reaches_uncond_tokens(service):
    """The negative prompt must become the CFG uncond token batch (and the
    cached empty-uncond tokens must be used when no negatives are given).

    NOTE a numeric output assertion is impossible with random weights: the
    reference-parity zero-initialized ``proj_out`` on every Transformer3D
    makes a fresh UNet invariant to ALL context until weights are loaded."""
    calls = []
    orig = service.tokenizer

    def spy(texts, **kw):
        calls.append(list(texts))
        return orig(texts, **kw)

    service.tokenizer = spy
    try:
        service.generate("push", _png_bytes(), negative_prompt="blurry")
        assert ["blurry", ""] in calls  # padded to max_batch=2
        calls.clear()
        service.generate("push", _png_bytes())
        # no negatives -> cached uncond tokens, only the prompt tokenized
        assert calls == [["push", ""]]
    finally:
        service.tokenizer = orig


def test_http_end_to_end(service):
    from PIL import Image

    from seervideoldm_tpu.serving import make_server

    server = make_server(service, port=0)  # ephemeral port
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # healthz
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = json.loads(r.read())
        assert health["ok"] is True

        # two concurrent generates — exercises the batching path
        body = json.dumps({
            "prompt": "push", "image": base64.b64encode(_png_bytes()).decode(),
        }).encode()
        results = {}

        def post(key):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=body,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as r:
                results[key] = (r.status, r.headers["Content-Type"], r.read())

        threads = [threading.Thread(target=post, args=(i,)) for i in range(2)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        for status, ctype, data in results.values():
            assert status == 200 and ctype == "image/gif"
            with Image.open(io.BytesIO(data)) as gif:
                assert gif.n_frames == 4

        # bad request: missing image
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"prompt": "x"}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=30)
        assert exc_info.value.code == 400

        # bad request: valid base64 of NOT-an-image must be a 400, not a 500
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"prompt": "x", "image": base64.b64encode(
                b"definitely not a png").decode()}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=30)
        assert exc_info.value.code == 400

        # oversized declared body -> 413 before buffering it (raw client:
        # urllib would overwrite a hand-set Content-Length)
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.putrequest("POST", "/generate")
        conn.putheader("Content-Type", "application/json")
        conn.putheader("Content-Length", str(64 * 1024 * 1024))
        conn.endheaders()
        assert conn.getresponse().status == 413
        conn.close()

        # unknown path
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope", timeout=30)
        assert exc_info.value.code == 404
    finally:
        server.shutdown()
        server.server_close()
