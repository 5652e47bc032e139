from dvren_tpu.fields.dense_grid import DenseGridConfig, DenseGridField
from dvren_tpu.fields.hash_mlp import HashMLPConfig, HashMLPField

__all__ = [
    "DenseGridConfig",
    "DenseGridField",
    "HashMLPConfig",
    "HashMLPField",
]
