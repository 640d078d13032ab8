from .bsdfs import (
    Diffuse, Phong, Plastic, Conductor, Bidirectional, Compose,
    ComposeSpatialVarying, SelectBSDF, NeuralBSDF, GlobalNeuralBSDF,
    identity, identity_div_pi, invert_z,
)
