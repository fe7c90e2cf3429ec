from . import loaders, pipeline  # noqa: F401
