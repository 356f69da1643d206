"""MCP tool layer — parity with the reference's ``gis_layer_search`` tool
(reference backend/mcp.py:23-29): expose search as an agent tool and
markdownify every string in the response tree (reference backend/
mcp.py:12-20).

fastmcp/httpx are optional (absent here); the markdownify transform and the
tool body are plain functions so they are testable without the transport.
Unlike the reference, the tool calls the engine in-process instead of
making an HTTP hop — one fewer serialization boundary.
"""

from __future__ import annotations

from typing import Any

from ..functions.text import html_to_markdown_str
from .models import SearchResponse, SemanticSearchRequest
from .search import SearchService


def markdownify_all_strings(obj: Any) -> Any:
    """Recursively convert every string in a response tree to markdown
    (reference backend/mcp.py:12-20 semantics, own implementation)."""
    if isinstance(obj, str):
        return html_to_markdown_str(obj)
    if isinstance(obj, dict):
        return {k: markdownify_all_strings(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [markdownify_all_strings(v) for v in obj]
    return obj


def gis_layer_search(service: SearchService, request: SemanticSearchRequest) -> SearchResponse:
    """The MCP tool body: search → markdownify → re-validate."""
    resp = service.search(request)
    return SearchResponse.model_validate(markdownify_all_strings(resp.model_dump()))


def create_mcp_server(service: SearchService) -> Any:  # pragma: no cover
    """Wrap the tool in a FastMCP server when the dependency exists."""
    try:
        from fastmcp import FastMCP
    except ImportError as e:
        raise ImportError("fastmcp is not installed; use gis_layer_search directly") from e

    mcp = FastMCP("govgis-spark")

    @mcp.tool
    def search_tool(request: SemanticSearchRequest) -> SearchResponse:
        return gis_layer_search(service, request)

    return mcp
