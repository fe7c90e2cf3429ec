from . import (  # noqa: F401
    closure,
    dedup,
    multimodal,
    range_join,
    shape,
    similarity,
    text,
)
