"""Regenerate tests/fixtures/golden_latents.npz (see test_golden_latents).

Run on CPU:  python tests/fixtures/gen_golden_latents.py
Regenerate ONLY when a sampler-math change is intentional.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir, os.pardir))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np  # noqa: E402

from test_golden_latents import FIXTURE, compute_outputs  # noqa: E402

if __name__ == "__main__":
    np.savez(FIXTURE, **compute_outputs())
    print(f"wrote {FIXTURE}")
