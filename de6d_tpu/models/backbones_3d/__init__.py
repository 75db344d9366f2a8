from . import vfe  # noqa: F401
