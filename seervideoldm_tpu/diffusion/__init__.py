from .schedules import (
    make_beta_schedule,
    make_ddim_timesteps,
    make_ddim_sampling_parameters,
    DiffusionSchedule,
    DDIMTables,
)
from .ddpm import add_noise, get_velocity
from .ddim import ddim_sample_loop

__all__ = [
    "make_beta_schedule",
    "make_ddim_timesteps",
    "make_ddim_sampling_parameters",
    "DiffusionSchedule",
    "DDIMTables",
    "add_noise",
    "get_velocity",
    "ddim_sample_loop",
]
