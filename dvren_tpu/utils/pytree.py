"""Small pytree helpers."""

from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

_T = TypeVar("_T")


def pytree_dataclass(cls: type[_T] | None = None, *, meta_fields: tuple[str, ...] = ()):
    """Register a dataclass as a JAX pytree.

    Fields named in ``meta_fields`` are static (hashable aux data, part of the
    jit cache key); all other fields are traced leaves.
    """

    def wrap(inner: type[_T]) -> type[_T]:
        if not dataclasses.is_dataclass(inner):
            inner = dataclasses.dataclass(frozen=True)(inner)
        data_fields = tuple(
            f.name for f in dataclasses.fields(inner) if f.name not in meta_fields
        )
        jax.tree_util.register_dataclass(
            inner, data_fields=data_fields, meta_fields=tuple(meta_fields)
        )
        return inner

    if cls is None:
        return wrap
    return wrap(cls)
