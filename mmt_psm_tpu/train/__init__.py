from . import ema, optim, supervised  # noqa: F401
