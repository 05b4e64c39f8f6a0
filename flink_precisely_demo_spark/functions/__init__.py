from .datetime_fns import parse_ts, parse_ts_millis
from .text import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
)

__all__ = [
    "parse_ts",
    "parse_ts_millis",
    "doc_fingerprint",
    "language_id",
    "quality_score",
    "token_count",
]
