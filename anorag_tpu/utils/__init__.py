from anorag_tpu.utils import file_io, json_parser, padding, text
from anorag_tpu.utils.logging import (
    StructuredLogger,
    get_logger,
    log_performance,
    logger,
    perf_stats,
    profile_trace,
    setup_logging,
    timed,
)

__all__ = [
    "file_io",
    "json_parser",
    "padding",
    "text",
    "StructuredLogger",
    "get_logger",
    "log_performance",
    "logger",
    "perf_stats",
    "profile_trace",
    "setup_logging",
    "timed",
]
