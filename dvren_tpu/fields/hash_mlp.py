"""Hash-MLP field: Instant-NGP-style encoding + tiny MLP heads as a pytree.

The analogue of ``hp_field_create_hash_mlp`` (reference
``hotpath/src/runtime/hp_runtime.cpp:341-370``) evaluated by
``hotpath/src/cpu/hash_mlp_cpu.cpp``. Accepts the reference's flat float32
parameter blob for parity, stores parameters as a structured pytree so they
are trainable (new capability - the reference has no hash-MLP gradients).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import jax
import jax.numpy as jnp
import numpy as np

from dvren_tpu.core.status import check
from dvren_tpu.ops import hashmlp as ops
from dvren_tpu.ops.hashmlp import HashMLPSpec
from dvren_tpu.utils.pytree import pytree_dataclass


@dataclass(frozen=True)
class HashMLPConfig:
    """Construction config; defaults match the reference's hardcoded
    hyperparameters (hash_mlp_cpu.cpp:170-177)."""

    spec: HashMLPSpec = dc_field(default_factory=HashMLPSpec)
    params: np.ndarray | list[float] | None = None  # flat blob, optional


@pytree_dataclass(meta_fields=("spec",))
@dataclass(frozen=True)
class HashMLPField:
    """params: dict pytree (see ops.hashmlp.unpack_params)."""

    params: dict
    spec: HashMLPSpec = dc_field(default_factory=HashMLPSpec)

    @staticmethod
    def create(config: HashMLPConfig) -> "HashMLPField":
        spec = config.spec
        if config.params is None:
            flat = np.zeros((spec.param_count,), np.float32)
        else:
            flat = np.asarray(config.params, np.float32).reshape(-1)
        check(flat.size == spec.param_count,
              f"hash-mlp params must have {spec.param_count} elements, "
              f"got {flat.size}")
        return HashMLPField(
            params=ops.unpack_params(jnp.asarray(flat), spec), spec=spec)

    @staticmethod
    def init_random(key: jax.Array,
                    spec: HashMLPSpec | None = None,
                    table_std: float = 1e-2) -> "HashMLPField":
        """He-style init for training from scratch (new capability)."""
        spec = spec or HashMLPSpec()
        ks = jax.random.split(key, 5)
        enc, hid = spec.encoding_dim, spec.hidden_dim
        w_std = float(np.sqrt(2.0 / enc))
        params = dict(
            hash_table=jax.random.normal(
                ks[0], (spec.n_levels, spec.table_size,
                        spec.features_per_level)) * table_std,
            sigma_w1=jax.random.normal(ks[1], (hid, enc)) * w_std,
            sigma_w2=jax.random.normal(ks[2], (hid,)) * float(np.sqrt(2.0 / hid)),
            sigma_b1=jnp.zeros((hid,)),
            sigma_b2=jnp.zeros(()),
            color_w1=jax.random.normal(ks[3], (hid, enc)) * w_std,
            color_w2=jax.random.normal(ks[4], (3, hid)) * float(np.sqrt(2.0 / hid)),
            color_b1=jnp.zeros((hid,)),
            color_b2=jnp.zeros((3,)),
        )
        params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
        return HashMLPField(params=params, spec=spec)

    def flat_params(self) -> jnp.ndarray:
        """Reference-layout flat blob (parity view)."""
        return ops.pack_params(self.params, self.spec)

    def sigma_at(self, positions: jnp.ndarray) -> jnp.ndarray:
        return ops.eval_sigma(positions, self.params, self.spec)

    def color_at(self, positions: jnp.ndarray) -> jnp.ndarray:
        return ops.eval_color(positions, self.params, self.spec)

    def sigma_at_planes(self, px, py, pz) -> jnp.ndarray:
        return ops.eval_planes(px, py, pz, self.params, self.spec)[0]

    def color_at_planes(self, px, py, pz):
        return ops.eval_planes(px, py, pz, self.params, self.spec)[1:]

    @property
    def supports_packed_eval(self) -> bool:
        """Single-pass sigma+color evaluation (shared hash encoding)."""
        return True

    def packed_eval_planes(self, px, py, pz):
        return ops.eval_planes(px, py, pz, self.params, self.spec)

    def with_params(self, params: dict) -> "HashMLPField":
        return HashMLPField(params=params, spec=self.spec)
