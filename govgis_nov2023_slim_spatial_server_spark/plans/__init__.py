from .builder import build_search_plan  # noqa: F401
