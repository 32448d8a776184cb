from aggregator_spark.streaming.ingest import (
    streaming_daily_counts,
    streaming_dedup_counts,
)

__all__ = ["streaming_daily_counts", "streaming_dedup_counts"]
