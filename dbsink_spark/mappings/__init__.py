from .base import ColumnSpec, Mapping, MessageFiltered
from .registry import BUILTIN, get_mappings, resolve

__all__ = [
    "ColumnSpec",
    "Mapping",
    "MessageFiltered",
    "BUILTIN",
    "get_mappings",
    "resolve",
]
