from .defaults import cfg, get_cfg
from .node import ConfigNode

__all__ = ["cfg", "get_cfg", "ConfigNode"]
