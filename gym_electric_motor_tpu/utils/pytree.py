"""Pytree dataclass helper.

All configuration and state containers in gym_electric_motor_tpu are immutable
dataclasses registered as JAX pytrees.  Array-valued fields are traced leaves;
fields declared with :func:`static_field` are hashable auxiliary data that
participate in the jit cache key (they select compiled branches such as the
converter topology or integrator kind).

This mirrors the role of the reference's mutable component objects
(``/root/reference/src/gym_electric_motor/core.py``) in a functional,
transform-friendly way.
"""

from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

T = TypeVar("T")


def static_field(**kwargs):
    """A dataclass field that is pytree auxiliary (static) data."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def struct(cls: type[T]) -> type[T]:
    """Decorator: turn ``cls`` into a frozen dataclass registered as a pytree.

    Provides ``.replace(**updates)`` like ``flax.struct.dataclass`` but without
    the flax dependency in the hot import path.
    """
    cls = dataclasses.dataclass(frozen=True)(cls)

    data_names = []
    static_names = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            static_names.append(f.name)
        else:
            data_names.append(f.name)

    def flatten_with_keys(obj):
        children = tuple(
            (jax.tree_util.GetAttrKey(name), getattr(obj, name)) for name in data_names
        )
        aux = tuple(getattr(obj, name) for name in static_names)
        return children, aux

    def flatten(obj):
        return (
            tuple(getattr(obj, name) for name in data_names),
            tuple(getattr(obj, name) for name in static_names),
        )

    def unflatten(aux, children):
        kwargs = dict(zip(data_names, children))
        kwargs.update(zip(static_names, aux))
        return cls(**kwargs)

    jax.tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten, flatten)

    def replace(self, **updates):
        return dataclasses.replace(self, **updates)

    cls.replace = replace
    return cls
