from .mlp import (
    SkipConnMLP, TwoStageMLP, AutoDecoder, PartitionedAutoDecoder,
    DensityEstimator, ACTIVATIONS, resolve_activation, linear,
)
from .conv import Discriminator
