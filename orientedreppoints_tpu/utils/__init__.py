from .config import Config, ConfigDict
from . import builder, checkpoint

__all__ = ["Config", "ConfigDict", "builder", "checkpoint"]
