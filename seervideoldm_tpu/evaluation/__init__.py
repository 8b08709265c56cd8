from .fvd import (
    preprocess_videos,
    frechet_distance,
    polynomial_mmd,
    FVDEvaluator,
)
from .i3d import InceptionI3d, load_i3d_params
from .inception_score import inception_score

__all__ = [
    "preprocess_videos",
    "frechet_distance",
    "polynomial_mmd",
    "FVDEvaluator",
    "InceptionI3d",
    "load_i3d_params",
    "inception_score",
]
