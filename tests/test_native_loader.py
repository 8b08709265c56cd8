"""Native C++ frame loader vs the PIL path."""
import numpy as np
import pytest
from PIL import Image

from seervideoldm_tpu.data.native import decode_frames, native_available
from seervideoldm_tpu.data.transforms import load_frame


@pytest.mark.skipif(not native_available(), reason="native loader not built")
def test_native_decode_matches_pil(tmp_path):
    rng = np.random.RandomState(0)
    paths = []
    for i, (w, h) in enumerate([(100, 60), (48, 80), (64, 64)]):
        img = Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
        p = tmp_path / f"f{i}.jpg"
        img.save(p, quality=95)
        paths.append(str(p))

    got = decode_frames(paths, 32)
    assert got is not None and got.shape == (3, 32, 32, 3)
    want = np.stack([load_frame(p, 32) for p in paths])
    # same JPEG decode, same triangle filter -> near-identical
    assert np.abs(got - want).max() < 0.03
    assert np.abs(got - want).mean() < 0.005


@pytest.mark.skipif(not native_available(), reason="native loader not built")
def test_native_decode_failure_returns_none(tmp_path):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not a jpeg")
    assert decode_frames([str(bad)], 32) is None
