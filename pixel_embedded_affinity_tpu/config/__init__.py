from .config import (Config, load_config, PRESETS,
                     resolve_compute_dtype)
