"""Small helpers for defining JAX pytree dataclasses.

All geometric containers in cv_tpu are frozen dataclasses registered as JAX
pytrees so they flow through ``jit`` / ``vmap`` / ``lax`` transparently.
"""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta_fields: tuple[str, ...] = ()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    ``meta_fields`` are treated as static (hashable) auxiliary data.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = tuple(
            f.name for f in dataclasses.fields(c) if f.name not in meta_fields
        )
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=meta_fields
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)
