"""Logging, timing and misc host-side helpers."""

from fusion4landslide_tpu.utils.logging import get_logger
from fusion4landslide_tpu.utils.timing import StageTimer

__all__ = ["get_logger", "StageTimer"]
