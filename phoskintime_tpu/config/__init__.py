"""Configuration layer: TOML loading, numeric policy, logging, labels."""

from phoskintime_tpu.config import numerics  # noqa: F401
from phoskintime_tpu.config.loader import (  # noqa: F401
    DEFAULT_BOUNDS,
    MODEL_NAMES,
    PhosKinConfig,
    find_config,
    load,
    load_config_toml,
)
from phoskintime_tpu.config.logconf import setup_logger  # noqa: F401
