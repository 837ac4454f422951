"""`davisinteractive.utils` — scribble / geometry helpers."""

from davisinteractive.utils import operations, scribbles

__all__ = ["operations", "scribbles"]
