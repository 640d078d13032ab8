from .fused_mlp import FusedSkipConnMLP, fused_mlp_apply, on_tpu
