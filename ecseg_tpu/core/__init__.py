from .config import ConfigError, StatFishParams, load_config, load_stat_fish_params
from . import imgio
