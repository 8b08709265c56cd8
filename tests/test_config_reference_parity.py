"""The reference's own YAML configs must parse verbatim (compat contract)."""
import os
import sys

import pytest

REF_CONFIGS = "/root/reference/configs"



pytestmark = pytest.mark.critical

@pytest.mark.parametrize("name", ["train", "eval", "inference", "inference_base"])
def test_reference_config_parses_verbatim(name, monkeypatch):
    path = os.path.join(REF_CONFIGS, f"{name}.yaml")
    if not os.path.exists(path):
        pytest.skip("reference configs not present")
    from seervideoldm_tpu.config import parse_args

    monkeypatch.setattr(sys, "argv", ["prog", "--config", path])
    cfg = parse_args("test")
    assert cfg.resolution == 256
    if name != "inference_base":  # the single-image demo has no dataset
        assert cfg.get("data_dir")
    # unknown/hub keys must be tolerated, not fatal
    assert cfg.get("nonexistent_key", "d") == "d"
