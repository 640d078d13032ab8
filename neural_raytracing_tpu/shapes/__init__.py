from .analytic import Sphere, SphereCloud, quad_solve
from .sdf import (
    SDF, SphereSDF, RoundBoxSDF, CapsuleSDF, ParametricSDFSet, FunctionalSDF,
    UNIT_SPHERE, sphere_sdf, box_sdf, capsule_sdf, prime,
)
from .nerf import PlainNeRF, PartialNeRF, NeRFLE, MPI, volumetric_integrate
from .mesh import TriangleMesh, load_obj
