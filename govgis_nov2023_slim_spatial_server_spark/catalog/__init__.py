"""Query catalog: importing the submodules populates the registry that
__spark_entry__.py exposes to the driver."""

from . import (  # noqa: F401
    advanced,
    geo_analytics,
    ml_eval,
    ml_prep,
    pipeline,
    relational,
    sketches,
    spatial_mm,
    streaming,
    temporal,
    vector_text,
)
from ._registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
