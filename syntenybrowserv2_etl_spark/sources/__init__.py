from . import io, obo, text_sources  # noqa: F401
