"""Dataset end-to-end tests over synthetic on-disk layouts."""
import json
import os

import numpy as np
import pytest
from PIL import Image


def _write_frames(root, n, size=(24, 18), seed=0):
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n):
        Image.fromarray(rng.randint(0, 255, (size[1], size[0], 3), dtype=np.uint8)).save(
            os.path.join(root, f"{i:05d}.jpg")
        )


def test_sthv2_dataset(tmp_path):
    from seervideoldm_tpu.data.datasets import SthV2Dataset

    ann = tmp_path / "annotations"
    ann.mkdir()
    entries = [{"id": "123", "label": "pushing a cup"},
               {"id": "456", "label": "lifting a box"}]
    with open(ann / "train.json", "w") as f:
        json.dump(entries, f)
    for e in entries:
        _write_frames(str(tmp_path / "rawframes" / e["id"]), 9)

    ds = SthV2Dataset(str(tmp_path), image_size=16, num_frames=6)
    assert len(ds) == 2
    video, prompt = ds[0]
    assert video.shape == (6, 16, 16, 3)  # 9 frames -> trilinear to 6
    assert prompt == "pushing a cup"
    assert -1.0 <= video.min() and video.max() <= 1.0


def test_bridge_dataset(tmp_path):
    from seervideoldm_tpu.data.datasets import BridgeDataset

    clips = [f"pick_up-the_cup/run{i}" for i in range(5)]
    with open(tmp_path / "path_id_bridgedata.txt", "w") as f:
        json.dump(clips, f)
    for c in clips:
        _write_frames(str(tmp_path / "rawframes" / c), 4)

    train = BridgeDataset(str(tmp_path), image_size=16, num_frames=6, split="train")
    val = BridgeDataset(str(tmp_path), image_size=16, num_frames=6, split="val")
    assert len(train) == 4 and len(val) == 1  # 80/20 split
    video, prompt = train[0]
    assert prompt == "pick up the cup"  # -/_ -> spaces
    assert video.shape == (6, 16, 16, 3)
    np.testing.assert_array_equal(video[4:], 0.0)  # zero-pad 4 -> 6


def test_epickitchens_dataset(tmp_path):
    from seervideoldm_tpu.data.datasets import EpicKitchensDataset

    ann = tmp_path / "epic-kitchens-100-annotations"
    ann.mkdir()
    with open(ann / "EPIC_100_train.csv", "w") as f:
        f.write("participant_id,video_id,narration,start_frame,stop_frame\n")
        f.write("P01,P01_01,open the fridge,1,6\n")
    frames_dir = tmp_path / "EPIC-KITCHENS" / "P01" / "rgb_frames" / "P01_01"
    frames_dir.mkdir(parents=True)
    rng = np.random.RandomState(1)
    for i in range(1, 7):
        Image.fromarray(rng.randint(0, 255, (18, 24, 3), dtype=np.uint8)).save(
            frames_dir / f"frame_{i:010d}.jpg"
        )
    ds = EpicKitchensDataset(str(tmp_path), image_size=16, num_frames=4)
    video, prompt = ds[0]
    assert prompt == "open the fridge"
    assert video.shape == (4, 16, 16, 3)
