from . import pytrees  # noqa: F401
