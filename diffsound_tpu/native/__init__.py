from .meshops import (
    native_available,
    unique_edges,
    promote_order2,
    connected_components,
    compact_tets,
)

__all__ = [
    "native_available",
    "unique_edges",
    "promote_order2",
    "connected_components",
    "compact_tets",
]
