"""Checkpoint / resume for fields and training state.

The reference has no serialization at all (SURVEY.md section 5: "Checkpoint /
resume: None"); this is a new capability required by the grid-fitting
workload (BASELINE.json configs). Plain ``.npz`` keeps zero extra
dependencies and is portable across hosts; the format stores the flattened
pytree leaves plus a JSON-encoded static header.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from dvren_tpu.core.plan import InterpMode, OobPolicy
from dvren_tpu.core.status import DvrenError
from dvren_tpu.fields.dense_grid import DenseGridField
from dvren_tpu.fields.hash_mlp import HashMLPField
from dvren_tpu.ops.hashmlp import HashMLPSpec

_FORMAT_VERSION = 1


def save_dense_grid(path: str | os.PathLike, field: DenseGridField,
                    extra: dict | None = None) -> None:
    header = dict(
        format=_FORMAT_VERSION, kind="dense_grid",
        bbox_min=list(field.bbox_min), bbox_max=list(field.bbox_max),
        interp=int(field.interp), oob=int(field.oob),
        extra=extra or {},
    )
    np.savez(path, header=json.dumps(header),
             sigma=np.asarray(field.sigma), color=np.asarray(field.color))


def load_dense_grid(path: str | os.PathLike) -> tuple[DenseGridField, dict]:
    with np.load(path, allow_pickle=False) as data:
        header = json.loads(str(data["header"]))
        if header.get("kind") != "dense_grid":
            raise DvrenError.invalid_argument(
                f"checkpoint kind mismatch: {header.get('kind')}")
        field = DenseGridField(
            sigma=jax.numpy.asarray(data["sigma"]),
            color=jax.numpy.asarray(data["color"]),
            bbox_min=tuple(header["bbox_min"]),
            bbox_max=tuple(header["bbox_max"]),
            interp=InterpMode(header["interp"]),
            oob=OobPolicy(header["oob"]),
        )
        return field, header.get("extra", {})


def save_hash_mlp(path: str | os.PathLike, field: HashMLPField,
                  extra: dict | None = None) -> None:
    spec = field.spec
    header = dict(
        format=_FORMAT_VERSION, kind="hash_mlp",
        spec=dict(n_levels=spec.n_levels,
                  features_per_level=spec.features_per_level,
                  table_size=spec.table_size, hidden_dim=spec.hidden_dim,
                  base_resolution=spec.base_resolution,
                  finest_resolution=spec.finest_resolution),
        extra=extra or {},
    )
    arrays = {k: np.asarray(v) for k, v in field.params.items()}
    np.savez(path, header=json.dumps(header), **arrays)


def load_hash_mlp(path: str | os.PathLike) -> tuple[HashMLPField, dict]:
    with np.load(path, allow_pickle=False) as data:
        header = json.loads(str(data["header"]))
        if header.get("kind") != "hash_mlp":
            raise DvrenError.invalid_argument(
                f"checkpoint kind mismatch: {header.get('kind')}")
        spec = HashMLPSpec(**header["spec"])
        params = {k: jax.numpy.asarray(data[k]) for k in data.files
                  if k != "header"}
        return HashMLPField(params=params, spec=spec), header.get("extra", {})


def save_train_state(path: str | os.PathLike, state, header: dict) -> None:
    """Generic pytree checkpoint (optimizer + params) for resume."""
    leaves, treedef = jax.tree.flatten(state)
    meta = dict(format=_FORMAT_VERSION, kind="train_state",
                treedef=str(treedef), header=header)
    np.savez(path, header=json.dumps(meta),
             **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)})


def load_train_state(path: str | os.PathLike, like):
    """Restore a pytree checkpoint into the structure of ``like``.

    The saved treedef and per-leaf shapes/dtypes are validated against
    ``like`` before unflattening: a same-leaf-count pytree with a different
    structure would otherwise silently misassign optimizer state."""
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["header"]))
        if meta.get("kind") != "train_state":
            raise DvrenError.invalid_argument("not a train_state checkpoint")
        leaves = [data[f"leaf_{i}"]
                  for i in range(len(data.files) - 1)]
        treedef = jax.tree.structure(like)
        if str(treedef) != meta.get("treedef"):
            raise DvrenError.invalid_argument(
                "train_state structure mismatch: checkpoint was saved from "
                f"{meta.get('treedef')}, restore target is {treedef}")
        like_leaves = jax.tree.leaves(like)
        if len(like_leaves) != len(leaves):
            raise DvrenError.invalid_argument(
                f"train_state leaf count mismatch: {len(leaves)} saved vs "
                f"{len(like_leaves)} in restore target")
        for i, (saved, ref) in enumerate(zip(leaves, like_leaves)):
            ref_shape = tuple(getattr(ref, "shape", ()))
            if tuple(saved.shape) != ref_shape:
                raise DvrenError.invalid_argument(
                    f"train_state leaf {i} shape mismatch: "
                    f"{tuple(saved.shape)} saved vs {ref_shape} expected")
        return jax.tree.unflatten(
            treedef, [jax.numpy.asarray(x) for x in leaves]), meta["header"]
