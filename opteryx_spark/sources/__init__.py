"""Data-source registry: prefix stores, in-memory frames, file formats.

Mirrors the reference's connector surface (``opteryx/connectors/__init__.py:96-104``
prefix registry; ``register_df``/``register_arrow`` in ``opteryx/__init__.py:92-94``;
format table ``opteryx/utils/file_decoders.py:876-892``) re-expressed as thin
wrappers over ``spark.read`` so Catalyst keeps pushdown/pruning.
"""

from opteryx_spark.sources.registry import (
    SourceRegistry,
    read_any,
    register_arrow,
    register_df,
    register_store,
    resolve_dataset,
)

__all__ = [
    "SourceRegistry",
    "read_any",
    "register_arrow",
    "register_df",
    "register_store",
    "resolve_dataset",
]
