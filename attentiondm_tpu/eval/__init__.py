from .fid import (
    calculate_frechet_distance,
    calculate_activation_statistics,
    compute_statistics_of_path,
    calculate_fid_given_paths,
    save_fid_stats,
)
from .inception import InceptionV3FID, inception_init, inception_apply, load_torch_inception

__all__ = [
    "calculate_frechet_distance",
    "calculate_activation_statistics",
    "compute_statistics_of_path",
    "calculate_fid_given_paths",
    "save_fid_stats",
    "InceptionV3FID",
    "inception_init",
    "inception_apply",
    "load_torch_inception",
]
