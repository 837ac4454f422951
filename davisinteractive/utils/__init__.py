"""`davisinteractive.utils` — scribble / geometry / plotting helpers."""

from davisinteractive.utils import operations, scribbles, visualization

__all__ = ["operations", "scribbles", "visualization"]
