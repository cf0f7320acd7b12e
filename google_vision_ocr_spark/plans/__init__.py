from . import extract  # noqa: F401
