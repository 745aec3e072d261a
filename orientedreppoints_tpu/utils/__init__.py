from .config import Config, ConfigDict
from . import builder, checkpoint, chunked
from .collect_env import collect_env, env_info_str

__all__ = ["Config", "ConfigDict", "builder", "checkpoint", "chunked"]
