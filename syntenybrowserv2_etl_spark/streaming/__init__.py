from . import drift  # noqa: F401
from . import dupprofile  # noqa: F401
from . import events  # noqa: F401
from . import frontier  # noqa: F401
from . import merge  # noqa: F401
from . import spans  # noqa: F401
from . import substr  # noqa: F401
