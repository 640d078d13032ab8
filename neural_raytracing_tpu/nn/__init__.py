from .mlp import (
    SkipConnMLP, TwoStageMLP, AutoDecoder, PartitionedAutoDecoder,
    DensityEstimator, ACTIVATIONS, ACTIVATION_GRADS, resolve_activation,
    activation_name, linear, prime_identity,
)
from .conv import Discriminator, Embedder
