"""Pytree dataclass helper.

Filter states, configs and results are frozen dataclasses registered as JAX
pytrees so they flow through ``jit`` / ``vmap`` / ``lax.scan`` unchanged.
Fields marked with :func:`static_field` are treated as auxiliary (hashable,
compile-time) data — e.g. integer sizes, method names — mirroring the role the
reference's plain-Python config dataclasses play (e.g. ``EDHConfig`` at
reference ``models/EDH_particle_filter.py:58``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

_T = TypeVar("_T")


def static_field(**kwargs: Any) -> Any:
    """A dataclass field excluded from pytree leaves (compile-time constant)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type[_T] | None = None, *, frozen: bool = True):
    """Decorator: make ``cls`` a frozen dataclass registered as a JAX pytree.

    Fields created with :func:`static_field` become pytree metadata; all other
    fields are pytree children (arrays / nested pytrees).
    """

    def wrap(c: type[_T]) -> type[_T]:
        dcls = dataclasses.dataclass(frozen=frozen)(c)
        data_fields = []
        meta_fields = []
        for f in dataclasses.fields(dcls):
            if f.metadata.get("static", False):
                meta_fields.append(f.name)
            else:
                data_fields.append(f.name)
        jax.tree_util.register_dataclass(
            dcls, data_fields=data_fields, meta_fields=meta_fields
        )
        return dcls

    if cls is None:
        return wrap
    return wrap(cls)


def replace(obj: _T, **changes: Any) -> _T:
    """``dataclasses.replace`` re-export for pytree dataclasses."""
    return dataclasses.replace(obj, **changes)
