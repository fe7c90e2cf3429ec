from . import hashing, transforms  # noqa: F401
