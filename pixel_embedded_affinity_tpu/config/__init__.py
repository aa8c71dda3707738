from .config import Config, load_config, PRESETS
