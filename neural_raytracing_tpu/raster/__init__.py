from .meshops import (
    edge_point_distance, face_areas_normals, face_point_distance,
    gather_scatter, interp_face_attrs, packed_to_padded, padded_to_packed,
    point_edge_distance, point_face_distance, point_line_seg_dists,
    point_triangle_dists,
)
from .rasterize import (
    Fragments, rasterize_meshes, rasterize_points, rasterize_spheres,
)
from .blending import (
    hard_rgb_blend, sigmoid_alpha_blend, softmax_rgb_blend,
)
from .compositing import (
    alpha_composite, norm_weighted_sum, weighted_sum,
)
from .renderer import (
    MeshRasterizer, PointsRasterizer, RasterizationSettings, SphereFragments,
    SpheresRasterizer,
)
from .pulsar import PulsarRenderer
