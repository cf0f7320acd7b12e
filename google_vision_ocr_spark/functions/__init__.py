from . import html, paths, text  # noqa: F401
