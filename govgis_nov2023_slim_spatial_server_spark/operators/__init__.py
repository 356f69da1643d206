from . import dedup, knn, topk, windows  # noqa: F401
