from .catre import CATREConfig, CATREDisRShared, init_params, prepare_inputs, refine_forward
from .compose import pose_scale_from_delta_init
from .heads import ConvOutPerRotHead, FCTransSizeHead, RotHead
from .pointnet import STN, PointNetFeat

# Registries mirroring the reference's net_factory
# (`core/catre/models/net_factory.py:6-13`).
PCLNETS = {"point_net": PointNetFeat}
HEADS = {
    "ConvOutPerRotHead": ConvOutPerRotHead,
    "FC_TransSizeHead": FCTransSizeHead,
}

__all__ = [
    "CATREConfig", "CATREDisRShared", "init_params", "prepare_inputs",
    "refine_forward", "pose_scale_from_delta_init", "ConvOutPerRotHead",
    "FCTransSizeHead", "RotHead", "STN", "PointNetFeat", "PCLNETS", "HEADS",
]
