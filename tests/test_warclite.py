"""warclite container source (sources/warclite.py): byte-exact
roundtrip (including real PNG/WAV payloads from the media fixture),
offset-index splits that tile the record set exactly, footer
validation, and the multi-file directory form."""

from __future__ import annotations

import os

import pytest

from aggregator_spark.sources.warclite import (
    _read_footer,
    register_warclite_source,
    write_warclite,
)


def _read(spark, path, per_split):
    register_warclite_source(spark)
    return (
        spark.read.format("warclite")
        .option("path", path)
        .option("records_per_split", str(per_split))
        .load()
    )


def test_roundtrip_binary_payloads_across_splits(spark, tmp_path):
    """Media payloads (real PNG/WAV/AVI bytes) survive byte-exact,
    and a per_split smaller than the record count forces the seek
    path — a mis-seeked split would corrupt every later field."""
    from aggregator_spark.operators.media_fixture import (
        build_payload,
        media_kind,
    )

    recs = [
        (k, f"x-fixture/{media_kind(k)}", build_payload(k))
        for k in range(40)
    ]
    p = str(tmp_path / "media.wlc")
    assert write_warclite(p, recs) == 40
    got = {
        r["doc_id"]: (r["mime"], bytes(r["payload"]))
        for r in _read(spark, p, per_split=7).collect()
    }
    assert got == {d: (m, b) for d, m, b in recs}


def test_splits_tile_the_index_exactly(spark, tmp_path):
    recs = [(i, "t/p", bytes([i % 251]) * (i % 13 + 1)) for i in range(103)]
    p = str(tmp_path / "tile.wlc")
    write_warclite(p, recs)
    df = _read(spark, p, per_split=10)
    # ceil(103/10) = 11 splits; no record lost or duplicated
    assert df.rdd.getNumPartitions() == 11
    ids = [r["doc_id"] for r in df.collect()]
    assert sorted(ids) == list(range(103))
    assert len(set(ids)) == 103
    assert len(_read_footer(p)) == 103


def test_directory_of_containers(spark, tmp_path):
    write_warclite(str(tmp_path / "a.wlc"), [(1, "m", b"x")])
    write_warclite(str(tmp_path / "b.wlc"), [(2, "m", b"yy")])
    rows = sorted(
        (r["doc_id"], bytes(r["payload"]))
        for r in _read(spark, str(tmp_path), per_split=5).collect()
    )
    assert rows == [(1, b"x"), (2, b"yy")]


def test_footer_validation_rejects_garbage(tmp_path):
    p = str(tmp_path / "junk.wlc")
    with open(p, "wb") as f:
        f.write(b"not a container at all, padded to trailer size....")
    with pytest.raises(ValueError, match="not a warclite container"):
        _read_footer(p)


def test_empty_path_and_bad_split_option(spark, tmp_path):
    register_warclite_source(spark)
    with pytest.raises(Exception):
        spark.read.format("warclite").option(
            "path", str(tmp_path)
        ).load().collect()
    p = str(tmp_path / "one.wlc")
    write_warclite(p, [(1, "m", b"x")])
    with pytest.raises(Exception):
        (
            spark.read.format("warclite")
            .option("path", p)
            .option("records_per_split", "0")
            .load()
            .collect()
        )


def test_cached_container_is_stamped_and_reused(spark):
    from aggregator_spark.sources.warclite import (
        cached_documents_container,
    )

    p1 = cached_documents_container(spark, "/root/testdata/sf0.001")
    p2 = cached_documents_container(spark, "/root/testdata/sf0.001")
    assert p1 == p2 and os.path.isdir(p1)
    files = [f for f in os.listdir(p1) if f.endswith(".wlc")]
    assert files == ["documents.wlc"]


def test_distributed_sink_roundtrip(spark, tmp_path):
    """write_containers (foreachPartition, one .wlc per partition)
    must roundtrip byte-exact through the reader, across multiple
    partitions and with binary payloads."""
    from pyspark.sql import functions as F

    from aggregator_spark.sources.warclite import write_containers

    df = (
        spark.range(0, 200)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("t/"), (F.col("id") % 3).cast("string")).alias(
                "mime"
            ),
            F.col("id").cast("string").cast("binary").alias("payload"),
        )
        .repartition(4)
    )
    out = str(tmp_path / "sink")
    write_containers(df, out)
    import glob as g

    files = g.glob(out + "/*.wlc")
    assert 1 < len(files) <= 4  # empty partitions write nothing
    got = {
        r["doc_id"]: (r["mime"], bytes(r["payload"]))
        for r in _read(spark, out, per_split=50).collect()
    }
    assert got == {
        i: (f"t/{i % 3}", str(i).encode()) for i in range(200)
    }


def test_nonexistent_path_rejected_at_option_validation(tmp_path):
    """A path that is neither a file nor a dir must fail reader
    construction with the same ValueError as an empty directory, not
    surface later as FileNotFoundError inside partitions()."""
    from aggregator_spark.sources.warclite import WarcliteReader

    with pytest.raises(ValueError, match="no .wlc containers"):
        WarcliteReader({"path": str(tmp_path / "never_written.wlc")})


def test_sink_rerun_overwrites_instead_of_duplicating(spark, tmp_path):
    """A retried/speculative task re-renames the same bytes over the
    same deterministic part-<pid>.wlc — re-running the whole sink
    (every task 'retried') must leave the same file set and the same
    records, never a second container per partition."""
    import glob as g

    from pyspark.sql import functions as F

    from aggregator_spark.sources.warclite import write_containers

    df = (
        spark.range(0, 60)
        .select(
            F.col("id").alias("doc_id"),
            F.lit("t/x").alias("mime"),
            F.col("id").cast("string").cast("binary").alias("payload"),
        )
        .repartition(3, "doc_id")
    )
    out = str(tmp_path / "sink_retry")
    write_containers(df, out)
    files_once = sorted(g.glob(out + "/*.wlc"))
    write_containers(df, out)  # simulate every task retrying
    assert sorted(g.glob(out + "/*.wlc")) == files_once
    got = sorted(
        r["doc_id"] for r in _read(spark, out, per_split=25).collect()
    )
    assert got == list(range(60))
