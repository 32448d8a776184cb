"""Stream-stream joins with event-time bounds — the attribution-join
shape (purchase ← most of an hour's clicks) Structured Streaming
supports natively once both sides carry watermarks and the join
condition bounds event time on both sides.

State bound: each side buffers only rows inside
watermark + interval — the time bound is what makes an unbounded
stream-stream join feasible (without it state grows forever). This is
the streaming counterpart of the batch as-of/band joins in
``operators/asof.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def attribution_join(
    events: DataFrame,
    attribution: str = "1 hour",
    watermark: str = "30 minutes",
    left_type: str = "purchase",
    right_type: str = "click",
) -> DataFrame:
    """Inner stream-stream join: every ``left_type`` event paired with
    the ``right_type`` events by the same user in the preceding
    ``attribution`` interval (inclusive bound on both ends).

    Returns (user_id, purchase_id, purchase_ts, click_id, click_ts).
    """
    purchases = (
        events.filter(F.col("event_type") == left_type)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    joined = purchases.join(
        clicks,
        F.expr(
            f"""
            p_user = c_user
            AND click_ts <= purchase_ts
            AND click_ts >= purchase_ts - INTERVAL {attribution}
            """
        ),
    )
    return joined.select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
    )


def static_enrich(stream: DataFrame, dim: DataFrame,
                  on: str = "user_id",
                  dim_cols: tuple[str, ...] = ("name", "segment")) -> DataFrame:
    """Stream-static enrichment join — the streaming counterpart of the
    reference's dimension joins (amplification Q9, main.py:219-229):
    each micro-batch joins against the static dimension snapshot. The
    dim side is broadcast (no stream-side shuffle, no state — unlike a
    stream-stream join the static side needs no watermark; Spark
    re-plans it per batch so a refreshed snapshot is picked up on
    restart). Left join keeps unmatched stream rows, the UPDATE-FROM
    keep-on-no-match analog."""
    cols = [F.col(c) for c in dim_cols]
    return stream.join(
        F.broadcast(dim.select(F.col(on), *cols)), on, "left"
    )
