from dvren_tpu.io.config import RenderConfig, parse_config, parse_config_file
from dvren_tpu.io.ppm import read_ppm, write_ppm
from dvren_tpu.io.checkpoint import (
    load_dense_grid,
    load_hash_mlp,
    load_train_state,
    save_dense_grid,
    save_hash_mlp,
    save_train_state,
)

__all__ = [
    "RenderConfig",
    "parse_config",
    "parse_config_file",
    "read_ppm",
    "write_ppm",
    "save_dense_grid",
    "load_dense_grid",
    "save_hash_mlp",
    "load_hash_mlp",
    "save_train_state",
    "load_train_state",
]
