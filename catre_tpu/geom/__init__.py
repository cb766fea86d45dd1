from .rotations import (
    allo_to_ego_mat,
    axangle_to_mat,
    euler_to_mat,
    get_rot_dim,
    lie_vec_to_mat,
    mat_to_lie_vec,
    mat_to_quat,
    mat_to_rot6d,
    normalize,
    qexp,
    quat_to_mat,
    rot6d_to_mat,
    rot_from_axangle_chain,
    rot_rep_to_mat,
)
from .transforms import (
    backproject,
    pose_3x4_to_4x4,
    pose_compose_3x4,
    project_pts,
    transform_normed_pts,
    transform_pts,
)
from .symmetry import axis_symmetry_rotation_bank, closest_rot_batch, y_rotation_bank_20
from .errors import (
    mean_re_te,
    rotation_error_deg,
    rotation_error_deg_sym_y,
    translation_error,
)

__all__ = [
    "allo_to_ego_mat", "axangle_to_mat", "euler_to_mat", "get_rot_dim",
    "lie_vec_to_mat", "mat_to_lie_vec", "mat_to_quat",
    "mat_to_rot6d", "normalize", "qexp", "quat_to_mat", "rot6d_to_mat",
    "rot_from_axangle_chain", "rot_rep_to_mat", "backproject", "pose_3x4_to_4x4",
    "pose_compose_3x4", "project_pts", "transform_normed_pts", "transform_pts",
    "axis_symmetry_rotation_bank", "closest_rot_batch", "y_rotation_bank_20",
    "mean_re_te", "rotation_error_deg", "rotation_error_deg_sym_y",
    "translation_error",
]
