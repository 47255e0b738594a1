from .config import Config, ConfigDict
from .registry import (BACKBONES, DATASETS, HEADS, LOSSES, NECKS, PIPELINES,
                       RULES, SAMPLERS, SEGMENTORS, Registry, build_from_cfg)

__all__ = [
    "Config", "ConfigDict", "Registry", "build_from_cfg", "BACKBONES",
    "NECKS", "HEADS", "SEGMENTORS", "LOSSES", "DATASETS", "PIPELINES",
    "SAMPLERS", "RULES",
]
