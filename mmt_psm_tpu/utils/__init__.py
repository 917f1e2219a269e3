from . import ramp  # noqa: F401
