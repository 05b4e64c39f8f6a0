from .enrichment_join import enrich, latest_per_key
from .windowed_agg import tumbling_window_agg

__all__ = ["enrich", "latest_per_key", "tumbling_window_agg"]
