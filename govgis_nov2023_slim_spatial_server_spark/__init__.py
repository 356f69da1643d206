"""PySpark-native analytics engine with the query surface of
joshuasundance-swca/govgis_nov2023-slim-spatial-server (hybrid semantic +
spatial search over GIS-layer metadata), extended with LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).

Everything here is built on the public Apache Spark DataFrame/SQL API.
Reference behavior is documented in SURVEY.md with file:line citations into
the read-only reference checkout; no reference code is copied.
"""

__version__ = "0.1.0"
