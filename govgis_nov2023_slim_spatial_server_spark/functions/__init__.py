from . import spatial, text, vector  # noqa: F401
