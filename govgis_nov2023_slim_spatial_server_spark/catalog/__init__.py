"""Query catalog: importing the submodules populates the registry that
__spark_entry__.py exposes to the driver."""

from . import advanced, pipeline, relational, sketches, spatial_mm, vector_text  # noqa: F401
from ._registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
