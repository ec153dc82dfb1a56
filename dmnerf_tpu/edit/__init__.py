from dmnerf_tpu.edit.transforms import (
    pose_spherical, r_x, r_y, r_z, generate_poses_eval, generate_poses_demo,
    load_mani_poses, load_mani_demo_poses,
)

__all__ = [
    "pose_spherical", "r_x", "r_y", "r_z", "generate_poses_eval",
    "generate_poses_demo", "load_mani_poses", "load_mani_demo_poses",
]
