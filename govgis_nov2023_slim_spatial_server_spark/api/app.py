"""FastAPI serving layer — behavioral parity with the reference's
``POST /search`` endpoint (reference backend/app.py:40-57).

FastAPI is an optional dependency (absent in the build container), so the
app factory import-gates it; the engine core never depends on it. The
lifecycle translation (SURVEY.md §3.1): one resident SparkSession + loaded
layers DataFrame replace the per-request asyncpg connection; plan build +
collect replace SQL string + fetch; errors stay in-band.
"""

from __future__ import annotations

from typing import Any

from .models import SearchResponse, SemanticSearchRequest
from .search import SearchService


def create_app(service: SearchService) -> Any:
    try:
        from fastapi import FastAPI
    except ImportError as e:  # pragma: no cover - env without fastapi
        raise ImportError(
            "fastapi is not installed; the engine API layer is importable "
            "without it — install fastapi to serve HTTP"
        ) from e

    app = FastAPI(title="govgis-spark search")

    @app.post("/search", response_model=SearchResponse)
    def search(request: SemanticSearchRequest) -> SearchResponse:
        return service.search(request)

    @app.get("/health")
    def health() -> dict[str, str]:
        return {"status": "ok"}

    return app
