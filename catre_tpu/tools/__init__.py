from .alignment import pnp_pose, ransac_umeyama, umeyama_similarity

__all__ = ["pnp_pose", "ransac_umeyama", "umeyama_similarity"]
