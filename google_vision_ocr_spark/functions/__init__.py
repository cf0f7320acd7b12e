from . import html, text  # noqa: F401
