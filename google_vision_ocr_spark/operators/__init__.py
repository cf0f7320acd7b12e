from . import assemble, preprocess, rasterize, recognize  # noqa: F401
