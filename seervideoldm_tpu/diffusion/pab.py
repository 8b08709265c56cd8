"""Pyramid Attention Broadcast (PAB) — training-free sampling acceleration.

Beyond-reference feature (Zhao et al. 2024, "Real-Time Video Generation
with Pyramid Attention Broadcast", arXiv 2408.12588; retrieved in
PAPERS.md).  Attention outputs change slowly between adjacent diffusion
steps in the middle of the sampling trajectory, and the rate of change
differs by attention type: spatial attention drifts fastest, temporal
attention slower, text cross-attention slowest.  PAB therefore *computes*
each attention's residual delta only every ``range`` steps and *broadcasts*
(reuses) the cached delta in between — a pyramid of reuse rates.

TPU-native design (no torch-style forward hooks):

- every attention site stores its residual delta in a flax ``pab``
  variable collection entry (created at the site, so paths are unique);
- the per-step compute/reuse decision is **static**: the schedule below is
  built in Python, deduplicated into a small set of step *modes* (one
  combination of cached/computed per attention type), and the sampler
  scans over a per-step mode index with ``lax.switch`` dispatching to one
  fully-fused UNet graph per mode.  XLA sees ordinary static graphs —
  cached sites simply have no attention computation in that branch;
- the cache pytree rides the sampler scan carry.

The schedule operates on *sampler step indices* (0 = highest timestep),
not raw diffusion timesteps, so it composes with any step count and with
both the DDIM and DPM-Solver++ loops.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

# Per-site flag dicts are keyed by attention type.  True = reuse the
# cached delta this step (skip the computation); False = compute + store.
SPATIAL = "spatial"   # per-frame spatial self-attention (text block attn1)
CROSS = "cross"       # per-frame text cross-attention (text block attn2)
TEMPORAL = "temporal"  # SWAT windowed causal temporal attention

COMPUTE_ALL: Tuple[bool, bool, bool] = (False, False, False)


@dataclass(frozen=True)
class PABConfig:
    """Broadcast ranges per attention type + the trajectory window.

    ``*_range = n``: within the window, compute that attention every n-th
    sampler step and broadcast the cached delta for the n-1 steps between.
    ``range = 1`` disables broadcasting for that type (bitwise-identical
    sampling).  ``window = (lo, hi)``: fractions of the step count outside
    of which every attention is computed — both trajectory ends are
    precision-critical (PAB §4.2), the defaults skip the first 10% and
    last 10% of steps.
    """

    spatial_range: int = 2
    cross_range: int = 6
    temporal_range: int = 4
    window: Tuple[float, float] = (0.1, 0.9)

    def __post_init__(self):
        for name in ("spatial_range", "cross_range", "temporal_range"):
            v = getattr(self, name)
            if not (isinstance(v, int) and v >= 1):
                raise ValueError(f"pab {name} must be an int >= 1, got {v!r}")
        lo, hi = self.window
        if not (0.0 <= lo <= hi <= 1.0):
            raise ValueError(f"pab window must satisfy 0 <= lo <= hi <= 1, got {self.window}")

    @property
    def enabled(self) -> bool:
        return max(self.spatial_range, self.cross_range, self.temporal_range) > 1


def build_pab_schedule(
    num_steps: int, config: PABConfig
) -> Tuple[Tuple[Tuple[bool, bool, bool], ...], np.ndarray]:
    """Build the static per-step broadcast schedule.

    Returns ``(modes, mode_idx)``:

    - ``modes``: the deduplicated tuple of step modes, each a
      ``(spatial_cached, cross_cached, temporal_cached)`` bool triple.
      ``modes[0]`` is always the all-compute mode (it always occurs: step 0
      computes everything — there is nothing to reuse yet).
    - ``mode_idx``: int32 array of shape ``(num_steps,)`` mapping each
      sampler step to its mode.

    Within the window a type is computed at the window start and every
    ``range`` steps after it; outside the window everything is computed.
    """
    if num_steps < 1:
        raise ValueError(f"num_steps must be >= 1, got {num_steps}")
    lo_frac, hi_frac = config.window
    w_lo = int(np.ceil(lo_frac * num_steps))
    w_hi = int(np.floor(hi_frac * num_steps))  # exclusive

    ranges = (config.spatial_range, config.cross_range, config.temporal_range)
    step_flags = []
    for i in range(num_steps):
        if i == 0 or not (w_lo <= i < w_hi):
            step_flags.append(COMPUTE_ALL)
        else:
            step_flags.append(tuple((i - w_lo) % r != 0 for r in ranges))

    modes = [COMPUTE_ALL]
    for flags in step_flags:
        if flags not in modes:
            modes.append(flags)
    mode_idx = np.asarray([modes.index(f) for f in step_flags], dtype=np.int32)
    return tuple(modes), mode_idx


def mode_to_flags(mode: Tuple[bool, bool, bool]) -> dict:
    """Expand a mode triple into the flag dict threaded through SeerUNet."""
    return {SPATIAL: mode[0], CROSS: mode[1], TEMPORAL: mode[2]}
