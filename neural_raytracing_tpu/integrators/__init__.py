from .integrators import (
    Integrator, Debug, Silhouette, Mask, Depth, LevelSurfaces, BasisBRDF,
    Illumination, Luminance, Direct, Path, NeRFIntegrator, NeRFReproduce,
    NeuralApprox, mis_weight,
)
