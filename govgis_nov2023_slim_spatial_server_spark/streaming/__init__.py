from . import facade  # noqa: F401
