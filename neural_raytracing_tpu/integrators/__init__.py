from .integrators import (
    Integrator, Debug, Silhouette, Mask, Depth, LevelSurfaces, BasisBRDF,
    Illumination, Luminance, Direct, Path, NeRFIntegrator, NeRFReproduce,
    mis_weight,
)
