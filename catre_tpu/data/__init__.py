from . import assets, meta
from .aug import (
    add_noise_depth,
    aug_3d_bbox,
    aug_poses_normal,
    aug_rt,
    aug_scale_normal,
    maybe_apply,
)
from .kps import normed_axis_points, normed_bbox_corners, select_kps
from .loader import CATRELoader, LoaderConfig, load_depth
from .nocs import (
    NOCSDataset,
    binary_mask_to_rle,
    get_dataset_dicts,
    load_init_poses_into_dataset,
    register_dataset,
    register_default_splits,
    rle_to_binary_mask,
)

__all__ = [
    "assets", "meta", "add_noise_depth", "aug_3d_bbox", "aug_poses_normal",
    "aug_rt", "aug_scale_normal", "maybe_apply", "normed_axis_points",
    "normed_bbox_corners", "select_kps", "CATRELoader", "LoaderConfig",
    "load_depth", "NOCSDataset", "binary_mask_to_rle", "get_dataset_dicts",
    "load_init_poses_into_dataset", "register_dataset",
    "register_default_splits", "rle_to_binary_mask",
]
