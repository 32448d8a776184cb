"""Analytics query pack 4 — function-surface coverage: event-time
windows in batch (tumbling + sliding via ``F.window``), min_by/max_by
aggregates, array building (collect_set), deterministic hash sampling,
and ranking analytics (percent_rank/ntile/cume_dist).

Determinism: sliding windows are epoch-aligned on both engines; ranking
windows carry total tiebreak orders; the sample predicate is md5-based
(identical bytes on both engines), never RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from aggregator_spark.schemas import load_testdata


def _dsum(col, alias):
    return F.sum(col.cast("decimal(30,6)")).cast("double").alias(alias)


def q_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows in batch — same ``F.window``
    operator the streaming ingest uses (epoch-aligned → equals
    date_trunc('hour'))."""
    events = load_testdata(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            _dsum(F.col("value"), "total_value"),
        )
        .select(
            # epoch-micros longs: raw TimestampType is OS-TZ-sensitive at
            # collect() time; integer micros hash identically everywhere
            F.unix_micros(F.col("win.start")).alias("ws"),
            "cnt",
            "total_value",
        )
        .orderBy("ws")
    )


def q_sliding_halfhour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min hop): every event lands in
    exactly two windows; Spark's Expand-based window assignment vs the
    oracle's explicit two-bucket UNION ALL."""
    events = load_testdata(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("win")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.unix_micros(F.col("win.start")).alias("ws"), "cnt")
        .orderBy("ws")
    )


def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by aggregates: each user's latest and earliest event
    (ties broken by event_id via struct comparison)."""
    events = load_testdata(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(
            F.expr(
                "max_by(event_id, struct(ts, event_id))"
            ).alias("last_event_id"),
            F.expr(
                "min_by(event_type, struct(ts, event_id))"
            ).alias("first_type"),
            F.unix_micros(F.max("ts")).alias("last_ts"),
        )
        .orderBy("user_id")
    )


def q_user_type_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: sorted distinct event-type array per user +
    its cardinality (collect_set → array_sort, all JVM-side).

    The catalog wrapper serializes the array to a comma-joined string:
    the driver canonicalizer sorts/hashes column values and raw arrays
    are unhashable there (same idiom as embedding_normalize,
    llm_queries.py). NULL-faithful: a NULL array (impossible here —
    collect_set over a non-empty group is never NULL — but kept for the
    pattern) stays NULL rather than ''."""
    events = load_testdata(spark, sf_dir, "events")
    types = F.array_sort(F.collect_set("event_type"))
    return (
        events.groupBy("user_id")
        .agg(types.alias("types_arr"))
        .select(
            "user_id",
            F.when(F.col("types_arr").isNull(), F.lit(None).cast("string"))
            .otherwise(F.array_join("types_arr", ","))
            .alias("types"),
            F.size("types_arr").cast("long").alias("n_types"),
        )
        .orderBy("user_id")
    )


def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/8 sample: md5(doc_id) prefix < '20' (hex).
    Hash-based sampling is reproducible across engines and retries —
    the property RNG-based ``df.sample`` lacks — and at scale keeps a
    consistent cohort across tables sharing the key."""
    docs = load_testdata(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    return (
        docs.filter(F.substring(h, 1, 2) < "20")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


def q_rank_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / ntile / cume_dist over per-user activity within
    each event type (total tiebreak order; fractions rounded)."""
    events = load_testdata(spark, sf_dir, "events")
    counts = events.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy("cnt", "user_id")
    return counts.select(
        "event_type",
        "user_id",
        "cnt",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def q_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json structured parsing (schema-typed, vs json_props'
    path extraction): props → struct<k:int> → typed arithmetic."""
    events = load_testdata(spark, sf_dir, "events")
    parsed = events.select(
        F.from_json("props", "k int").alias("p"), F.col("value")
    )
    return (
        parsed.groupBy((F.col("p.k") % 5).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            _dsum(F.col("value"), "total_value"),
        )
        .orderBy("k_mod")
    )


def q_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling pass: one scan → row count, per-column null
    counts, exact distinct cardinalities, value bounds. The shape every
    ingestion pipeline runs before trusting a new drop of data; all
    aggregates fuse into a single HashAggregate over one scan."""
    events = load_testdata(spark, sf_dir, "events")
    return events.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("null_user_id"),
        F.sum(F.col("props").isNull().cast("long")).alias("null_props"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_types"),
        # epoch-micros longs, not raw timestamps (OS-TZ-sensitive at
        # collect(): the driver box being UTC is not a contract)
        F.unix_micros(F.min("ts")).alias("min_ts"),
        F.unix_micros(F.max("ts")).alias("max_ts"),
        F.round(
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_value"),
    )


def q_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator (explode/LATERAL) + global top-k: corpus-wide token
    frequencies, top 20 with total tiebreak. The explode feeds a
    partial-aggregated group-count, so the shuffle carries (token,
    partial_count), never raw token rows."""
    docs = load_testdata(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(20)
    )


def q_geomean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped-agg Pandas UDAF (operators/udfs.py): per-type
    geometric-style mean exp(mean(log1p(v)))-1, rounded — the oracle
    computes the same closed form in SQL."""
    from aggregator_spark.operators.udfs import geometric_mean

    events = load_testdata(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.round(geometric_mean("value"), 6).alias("geo_value"))
        .orderBy("event_type")
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline, REAL codecs, hash-matched: each document
    becomes a deterministic encoded payload (even doc_id → gradient
    grayscale PNG, odd → sine-burst PCM WAV, keyed on doc_id % 256),
    then flows through the real Arrow-batched decode operators
    (operators/multimodal.py fake=False → operators/codecs.py full PNG
    unfilter / WAV PCM + spectral bands). The oracle joins a 256-row
    expected-value lookup computed by the same codec functions in plain
    Python (operators/media_fixture.py), so the encode→decode→feature
    round-trip is value-checked, not rows-only. Floats serialize as
    HALF_UP micro-unit ints (float-repr-proof across engines)."""
    from pyspark.sql import types as T

    from aggregator_spark.operators.media_fixture import (
        N_KEYS,
        build_payload,
        media_kind,
    )
    # Fan the doc_id column out to a HANDFUL of partitions, not full
    # scatter(): the sf0.1 documents file arrives as ONE split, which
    # serializes the codec work on one core — but each extra partition
    # also costs a Python-worker round trip, and at fixture payload
    # size that overhead passes the codec win quickly (isolated warm,
    # sf0.1: 1 part → 0.78 s, 8 → 0.45 s, 32 (full scatter) → 1.08 s,
    # 64 → 1.70 s). The repartition ships only 8-byte ids. At real
    # payload scale the media table arrives as many splits (the branch
    # no-ops) and per-row codec work dominates — SCALE.md's policy.
    docs = load_testdata(spark, sf_dir, "documents").select("doc_id")
    from aggregator_spark.operators.util import scatter

    docs = scatter(docs, partitions=8)
    media_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            ids = [int(d) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "kind": pd.Series(
                        [media_kind(i) for i in ids], dtype="object"
                    ),
                    "payload": pd.Series(
                        [build_payload(i % N_KEYS) for i in ids],
                        dtype="object",
                    ),
                }
            )

    media = docs.mapInPandas(encode, media_schema)
    return features_from_media(media)


def features_from_media(media: DataFrame) -> DataFrame:
    """The decode→feature tail of ``q_media_features`` — real codecs,
    HALF_UP micro-unit serialization — factored so the container-fed
    twin (``media_archive_features``, analytics_queries11) runs the
    IDENTICAL plan over payloads that came off disk instead of from
    the inline encoder. ``media``: (media_id long, kind string,
    payload binary)."""
    from aggregator_spark.operators.multimodal import (
        decode_image_features,
        extract_audio_features,
    )

    def ser(col):  # float32 array → HALF_UP micro-unit csv
        return F.concat_ws(
            ",",
            F.transform(
                col, lambda x: F.round(x * 1e6).cast("bigint").cast("string")
            ),
        )

    img = decode_image_features(media, fake=False).select(
        "media_id",
        F.lit("image").alias("kind"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("long").alias("rms_micro"),
        ser("features").alias("feat_str"),
    )
    aud = extract_audio_features(media, fake=False).select(
        "media_id",
        F.lit("audio").alias("kind"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        "duration_ms",
        F.round(F.col("rms") * 1e6).cast("bigint").alias("rms_micro"),
        ser("mfcc").alias("feat_str"),
    )
    return img.unionByName(aud)


def features_from_decoded(dec: DataFrame) -> DataFrame:
    """``features_from_media``'s output shape from an already-decoded
    relation (``multimodal.media_decode_all`` — r13: the ingest store
    decodes each payload exactly once; this projection replaces the
    second decode pass). Same column set, same HALF_UP micro-unit
    serialization expressions, image+audio rows only — row-equal to
    ``features_from_media`` over the same payloads (pinned in
    tests/test_multimodal_fused.py)."""

    def ser(col):  # float32 array → HALF_UP micro-unit csv
        return F.concat_ws(
            ",",
            F.transform(
                col, lambda x: F.round(x * 1e6).cast("bigint").cast("string")
            ),
        )

    img = dec.filter(F.col("kind") == "image").select(
        "media_id",
        F.lit("image").alias("kind"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("long").alias("rms_micro"),
        ser("features").alias("feat_str"),
    )
    aud = dec.filter(F.col("kind") == "audio").select(
        "media_id",
        F.lit("audio").alias("kind"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        "duration_ms",
        F.round(F.col("rms") * 1e6).cast("bigint").alias("rms_micro"),
        ser("features").alias("feat_str"),
    )
    return img.unionByName(aud)


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling, REAL demux, hash-matched: each document
    becomes a deterministic uncompressed-AVI payload (2–5 moving
    gradient frames keyed on doc_id % 64, operators/media_fixture.py),
    then flows through the real Arrow-batched sampler
    (operators/multimodal.py:sample_video_frames fake=False →
    operators/codecs.py RIFF demux, bottom-up DIB decode, per-instant
    source-frame selection, PNG re-encode). The output hashes the
    sampled PNG bytes (md5 hex) because the payload itself is the value
    under test; the oracle joins a per-key expected-frames VALUES
    lookup computed by the same codec functions in plain Python."""
    from pyspark.sql import types as T

    from aggregator_spark.operators.media_fixture import (
        N_VIDEO_KEYS,
        VIDEO_EVERY_MS,
        build_video_payload,
    )
    from aggregator_spark.operators.multimodal import sample_video_frames

    # same bounded 8-way fan-out as q_media_features (one input split
    # otherwise serializes the demux on one core; full scatter costs
    # more in Python-worker round trips than it buys at fixture size)
    from aggregator_spark.operators.util import scatter

    docs = scatter(
        load_testdata(spark, sf_dir, "documents").select("doc_id"),
        partitions=8,
    )
    media_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            ids = [int(d) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "kind": pd.Series(["video"] * len(ids), dtype="object"),
                    "payload": pd.Series(
                        [build_video_payload(i % N_VIDEO_KEYS) for i in ids],
                        dtype="object",
                    ),
                }
            )

    media = docs.mapInPandas(encode, media_schema)
    frames = sample_video_frames(media, every_ms=VIDEO_EVERY_MS, fake=False)
    # checkpoint BEFORE the orderBy: the global sort's range
    # partitioner samples its child in a separate pass, so an
    # unmaterialized child pays the whole demux+sample+md5 subtree
    # TWICE (the r12 q_image_dhash lesson, same decode-heavy shape)
    hashed = frames.select(
        "media_id",
        F.col("frame_index").cast("long").alias("frame_index"),
        "frame_ts_ms",
        F.md5("frame_payload").alias("frame_md5"),
    ).localCheckpoint(eager=True)
    return hashed.orderBy("media_id", "frame_ts_ms")


def q_rolling_7d_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling mean of daily event counts per event type — a
    RANGE-frame window over day offsets (not ROWS: gap days must still
    widen the frame). Exact-decimal mean: sum cast to decimal before
    the divide so partial-agg order can't perturb the double."""
    events = load_testdata(spark, sf_dir, "events")
    daily = (
        events.select(
            F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
        )
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "day",
        "event_type",
        "cnt",
        F.round(
            F.sum(F.col("cnt").cast("decimal(30,6)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            6,
        ).alias("avg_7d"),
    )


def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension merge: a deterministic update batch (every 10th
    customer gets a new acctbal) applied to the customer dim as
    slowly-changing-type-2 rows — prior version closed with an end
    date, new version open-ended. Pure union + change flags; at scale
    this is one broadcast-join pass over the dim, no shuffle of the
    fact. Oracle builds the same two-generation history in SQL."""
    customer = load_testdata(spark, sf_dir, "customer")
    eff = F.lit("2024-02-01").cast("date")
    updates = customer.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        "c_mktsegment",
    )
    upd_keys = updates.select("c_custkey")
    closed = (
        customer.join(F.broadcast(upd_keys), "c_custkey", "left_semi")
        .select(
            "c_custkey", "c_acctbal",
            F.lit("1970-01-01").cast("date").alias("valid_from"),
            eff.alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    unchanged = (
        customer.join(F.broadcast(upd_keys), "c_custkey", "left_anti")
        .select(
            "c_custkey", "c_acctbal",
            F.lit("1970-01-01").cast("date").alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    fresh = updates.select(
        "c_custkey", "c_acctbal",
        eff.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return closed.unionByName(unchanged).unionByName(fresh)


ANALYTICS4_QUERIES = {
    "profile_events": q_profile_events,
    "json_struct": q_json_struct,
    "top_tokens": q_top_tokens,
    "geomean_value": q_geomean_value,
    "media_features": q_media_features,
    "video_frames": q_video_frames,
    "tumbling_hourly": q_tumbling_hourly,
    "sliding_halfhour": q_sliding_halfhour,
    "latest_event_per_user": q_latest_event_per_user,
    "user_type_arrays": q_user_type_arrays,
    "deterministic_sample": q_deterministic_sample,
    "rank_analytics": q_rank_analytics,
    "rolling_7d_avg": q_rolling_7d_avg,
    "scd2_merge": q_scd2_merge,
}
