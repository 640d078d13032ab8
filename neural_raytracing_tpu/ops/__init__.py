from .math import (
    normalize, nonzero_eps, dot, smooth_min, weak_sigmoid, pos_weak_sigmoid,
    rotate_vector, reflect, local_reflect, eikonal_loss, mse2psnr, fwidth,
    qmul, quat_rot, almost_identity, PI, TWO_PI, INV_PI,
)
from .encoding import fourier_basis, fourier_encode, fourier_size
from .frames import coordinate_system, partial_frame, to_local, from_local
from .warps import (
    square_to_uniform_disk_concentric, square_to_uniform_sphere,
    square_to_uniform_sphere_pdf, square_to_cos_hemisphere,
    square_to_cos_hemisphere_pdf, random_on_sphere,
)
from .dirs import (
    uv_to_elev_azim, elev_azim_to_uv, elev_azim_to_dir, dir_to_elev_azim,
    uv_to_dir, dir_to_uv,
)
from .rusin import param_rusin, param_rusin2
from .fresnel import fresnel, fresnel_diff_refl, fresnel_conductor
from .ssim import ssim, ms_ssim
from .losses import (
    masked_loss, binary_cross_entropy, binary_cross_entropy_with_logits,
)
from .geometry import (
    ray_point_dist, distance_between_rays_and_segments, mesh_level_surfaces,
)
from .misc import (
    cartesian_to_log_polar, log_polar_indices, cartesian_indices,
    finite_diff_ray, edge_detection, gaussian_kernel,
    inverse_tan_activation, crop,
)
