from anorag_tpu.config.defaults import DEFAULT_CONFIG, default_config
from anorag_tpu.config.loader import ConfigLoader, config, deep_merge, get_path, set_path

__all__ = [
    "DEFAULT_CONFIG",
    "default_config",
    "ConfigLoader",
    "config",
    "deep_merge",
    "get_path",
    "set_path",
]
