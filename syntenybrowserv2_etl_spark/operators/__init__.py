from . import (  # noqa: F401
    asof,
    closure,
    components,
    curation,
    dedup,
    multimodal,
    range_join,
    sampling,
    shape,
    similarity,
    skew,
    text,
)
