from .cameras import (
    FoVPerspectiveCamera, NeRFCamera, NeRFMMCamera, NeRVCamera, DTUCamera,
    look_at_view_transform, look_at_rotation,
    camera_position_from_spherical_angles, spherical_positions, lift,
    nerf_c2w,
)
