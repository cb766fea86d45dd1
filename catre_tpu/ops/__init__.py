from .sampling import (
    ball_crop_indices,
    batch_ball_crop,
    crop_ball_from_cloud,
    farthest_point_indices,
    random_sample_indices,
)

__all__ = [
    "ball_crop_indices", "batch_ball_crop", "crop_ball_from_cloud",
    "farthest_point_indices", "random_sample_indices",
]
