from .schedules import get_beta_schedule, DiffusionSchedule, compute_alpha
from .sampling import (
    ddim_sample,
    ddpm_sample,
    ddim_step,
    ddpm_step,
    make_timestep_seq,
)
from .losses import noise_estimation_loss, loss_registry

__all__ = [
    "get_beta_schedule",
    "DiffusionSchedule",
    "compute_alpha",
    "ddim_sample",
    "ddpm_sample",
    "ddim_step",
    "ddpm_step",
    "make_timestep_seq",
    "noise_estimation_loss",
    "loss_registry",
]
