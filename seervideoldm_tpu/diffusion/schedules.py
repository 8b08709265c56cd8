"""Diffusion noise schedules and DDIM subsequence tables.

Numerics match the reference exactly (including its quirks):

- ``make_beta_schedule`` — reference ``ldm/modules/diffusionmodules/util.py:21-43``.
  Note the reference's "linear" schedule is sqrt-space linear (what diffusers
  calls ``scaled_linear``).
- ``make_ddim_timesteps`` — reference ``util.py:46-60``, **including the +1
  offset** applied to the uniform-stride subsequence.
- ``make_ddim_sampling_parameters`` — reference ``util.py:63-74`` (DDIM
  eq. 12 sigmas).
- The *training* schedule follows the SD-1.5 DDPMScheduler config
  (``scaled_linear``, beta 0.00085→0.012, 1000 steps; reference
  ``train.py:234``) while the *sampler* defaults to linear_start=1e-4,
  linear_end=2e-2 (reference ``ddim_video.py:27-29``).  This train/sample
  schedule mismatch is a faithful reproduction of the reference behavior;
  both are configurable here.

All tables are computed in float64 numpy and exposed as float32, mirroring
the reference's float64 → float32 pipeline.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

SD15_BETA_START = 0.00085
SD15_BETA_END = 0.012
DEFAULT_LINEAR_START = 1e-4
DEFAULT_LINEAR_END = 2e-2


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = DEFAULT_LINEAR_START,
    linear_end: float = DEFAULT_LINEAR_END,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedule table (float64). Reference ``util.py:21-43``."""
    if schedule == "linear":
        # sqrt-space linear, i.e. diffusers' "scaled_linear".
        betas = np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64) ** 2
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(timesteps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas


def make_ddim_timesteps(
    ddim_discr_method: str, num_ddim_timesteps: int, num_ddpm_timesteps: int
) -> np.ndarray:
    """DDIM timestep subsequence **with the reference's +1 offset** (``util.py:57``).

    ``"trailing"`` (beyond reference; Lin et al. 2024 "Common Diffusion Noise
    Schedules and Sampler Steps are Flawed" §2.2 / diffusers
    ``timestep_spacing="trailing"``) anchors the grid at the FINAL timestep
    ``T-1`` instead of near 0: the reference's uniform(+1) grid for S=50
    starts sampling at t=981, i.e. the model never sees the pure-noise
    distribution it was trained toward — trailing fixes that (required for
    the zero-terminal-SNR recipe to actually start from SNR 0).  Returned
    ascending like the other methods; no +1 offset (the grid is already
    1-anchored at the low end: last entry is ``T/S - 1`` → ... → ``T-1``).
    """
    if ddim_discr_method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        ddim_timesteps = np.asarray(list(range(0, num_ddpm_timesteps, c)))
    elif ddim_discr_method == "quad":
        ddim_timesteps = (
            np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2
        ).astype(int)
    elif ddim_discr_method == "trailing":
        # built from exactly S integer indices — a float arange from T can
        # overshoot and emit S+1 entries whose lowest rounds to -1 (62 of
        # the step counts in 1..999, e.g. S=61)
        s = num_ddim_timesteps
        ts = np.round(np.arange(1, s + 1) * (num_ddpm_timesteps / s))
        return ts.astype(np.int64) - 1  # ascending, ends exactly at T-1
    else:
        raise NotImplementedError(f"unknown ddim discretization: {ddim_discr_method}")
    return ddim_timesteps + 1


def make_ddim_sampling_parameters(
    alphacums: np.ndarray, ddim_timesteps: np.ndarray, eta: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-step (sigma, alpha, alpha_prev) per DDIM eq. 12. Reference ``util.py:63-74``."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.asarray([alphacums[0]] + alphacums[ddim_timesteps[:-1]].tolist())
    sigmas = eta * np.sqrt((1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev))
    return sigmas, alphas, alphas_prev


def rescale_zero_terminal_snr(alphas_cumprod: np.ndarray) -> np.ndarray:
    """Rescale a ᾱ table so the terminal SNR is exactly zero.

    Lin et al. 2024 Algorithm 1 (operates in √ᾱ space: shift so the last
    entry is 0, scale so the first is unchanged).  With ᾱ_T = 0 the model is
    actually trained on / sampled from pure noise at t = T-1, fixing the
    leaked-mean brightness bias of the SD-1.5 schedule (its terminal SNR is
    ~0.0047, never zero).  Requires v-prediction: the ε parameterization is
    undefined at SNR 0 (ε ≡ x_t there carries no signal information).
    """
    sqrt_acp = np.sqrt(alphas_cumprod.astype(np.float64))
    first, last = sqrt_acp[0], sqrt_acp[-1]
    sqrt_acp = (sqrt_acp - last) * first / (first - last)
    return sqrt_acp**2


@dataclass(frozen=True)
class DDIMTables:
    """Stacked per-step DDIM tables, ordered from high noise to low.

    Shapes all ``(num_steps,)`` float32; index 0 is the **first sampler
    iteration** (highest timestep), so a ``lax.scan`` over these arrays walks
    the reverse process directly.
    """

    timesteps: np.ndarray  # DDPM timestep fed to the UNet at each iteration
    alphas: np.ndarray
    alphas_prev: np.ndarray
    sigmas: np.ndarray
    sqrt_one_minus_alphas: np.ndarray


@dataclass(frozen=True)
class DiffusionSchedule:
    """Full DDPM schedule with derived tables + DDIM table construction.

    Mirrors ``DDIMSampler.make_schedule`` (reference ``ddim_video.py:27-68``)
    but is a pure data object — no device placement quirks (the reference
    force-moves buffers to CUDA, ``ddim_video.py:21-25``).
    """

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray

    @staticmethod
    def create(
        num_timesteps: int = 1000,
        schedule: str = "linear",
        linear_start: float = DEFAULT_LINEAR_START,
        linear_end: float = DEFAULT_LINEAR_END,
        cosine_s: float = 8e-3,
        betas: np.ndarray | None = None,
        rescale_zero_snr: bool = False,
    ) -> "DiffusionSchedule":
        if betas is None:
            betas = make_beta_schedule(
                schedule, num_timesteps, linear_start=linear_start,
                linear_end=linear_end, cosine_s=cosine_s,
            )
        alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
        if rescale_zero_snr:
            alphas_cumprod = rescale_zero_terminal_snr(alphas_cumprod)
            # back-derive betas so betas/ᾱ stay consistent (terminal β = 1)
            prev = np.append(1.0, alphas_cumprod[:-1])
            with np.errstate(divide="ignore", invalid="ignore"):
                betas = 1.0 - np.where(prev > 0, alphas_cumprod / prev, 0.0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
        return DiffusionSchedule(
            betas=betas.astype(np.float32),
            alphas_cumprod=alphas_cumprod.astype(np.float32),
            alphas_cumprod_prev=alphas_cumprod_prev.astype(np.float32),
        )

    @staticmethod
    def sd15_train_schedule(
        num_timesteps: int = 1000, rescale_zero_snr: bool = False
    ) -> "DiffusionSchedule":
        """The SD-1.5 DDPMScheduler schedule used for *training* noise
        (scaled_linear 0.00085→0.012; reference ``train.py:234``)."""
        return DiffusionSchedule.create(
            num_timesteps, "linear", linear_start=SD15_BETA_START,
            linear_end=SD15_BETA_END, rescale_zero_snr=rescale_zero_snr,
        )

    @property
    def has_zero_terminal_snr(self) -> bool:
        return float(self.alphas_cumprod[-1]) == 0.0

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])

    @property
    def sqrt_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(self.alphas_cumprod)

    @property
    def sqrt_one_minus_alphas_cumprod(self) -> np.ndarray:
        return np.sqrt(1.0 - self.alphas_cumprod)

    def ddim_tables(
        self, num_steps: int, eta: float = 0.0, discr_method: str = "uniform"
    ) -> DDIMTables:
        """Build stacked reverse-order DDIM tables for a scan-based sampler."""
        ddim_timesteps = make_ddim_timesteps(discr_method, num_steps, self.num_timesteps)
        sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
            self.alphas_cumprod.astype(np.float64), ddim_timesteps, eta
        )
        # Reverse so index 0 = first sampler iteration (highest timestep),
        # matching the reference's reversed python loop (ddim_video.py:156-166).
        rev = slice(None, None, -1)
        return DDIMTables(
            timesteps=ddim_timesteps[rev].astype(np.int32),
            alphas=alphas[rev].astype(np.float32),
            alphas_prev=alphas_prev[rev].astype(np.float32),
            sigmas=sigmas[rev].astype(np.float32),
            sqrt_one_minus_alphas=np.sqrt(1.0 - alphas)[rev].astype(np.float32),
        )
