from . import events  # noqa: F401
from . import merge  # noqa: F401
