"""Streaming incremental corpus preparation (VERDICT r8 item 4):
batch/stream result identity across restarts.

The stream side drives the docwave source through N separate query
starts sharing ONE checkpoint — a checkpoint-recovery handoff between
every wave, the strongest restart exercise — while the batch twin is a
plain driver loop feeding the same wave boundaries to the foreachBatch
body directly (no source, no checkpoint). Batch boundaries ARE
semantics for incremental dedup (transitive duplicate chains resolve
differently across boundaries), so identity is pinned at identical
boundaries; what the test proves is that the streaming machinery —
offset tracking, replay, restart, generation handoff — adds nothing
and loses nothing relative to the batch job.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from aggregator_spark.llm_queries import NEW_BATCH_MOD
from aggregator_spark.schemas import load_testdata
from aggregator_spark.sources.versioned_table import (
    list_versions,
    read_table,
)
from aggregator_spark.streaming.corpus_prepare_stream import (
    init_prepared_state,
    prepare_micro_batch,
    run_corpus_prepare_stream,
    wave_doc_ids,
)

N_WAVES = 3


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.fixture(scope="module")
def roots(tmp_path_factory):
    return {
        "stream": str(tmp_path_factory.mktemp("cps_stream")),
        "batch": str(tmp_path_factory.mktemp("cps_batch")),
    }


def _wave_df(spark, sf_dir, w):
    ids = wave_doc_ids(sf_dir, NEW_BATCH_MOD, N_WAVES)[w]
    docs = load_testdata(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id").isin(ids)).select("doc_id", "text")


def test_stream_matches_batch_twin_across_restarts(spark, sf_dir, roots):
    for root in roots.values():
        init_prepared_state(spark, sf_dir, root, NEW_BATCH_MOD)

    # batch twin: plain driver loop, same boundaries, no streaming
    for w in range(N_WAVES):
        prepare_micro_batch(_wave_df(spark, sf_dir, w), w, roots["batch"])

    # stream: one query start per wave, shared checkpoint — every
    # wave boundary is also a stop/restart boundary
    for k in range(1, N_WAVES + 1):
        run_corpus_prepare_stream(
            spark,
            sf_dir,
            roots["stream"],
            NEW_BATCH_MOD,
            N_WAVES,
            max_waves=k,
        )

    # the final corpus generations hold identical content
    corpus_cols = ["doc_id", "text"]
    s_corpus = read_table(spark, os.path.join(roots["stream"], "corpus"))
    b_corpus = read_table(spark, os.path.join(roots["batch"], "corpus"))
    assert _rows(s_corpus, corpus_cols) == _rows(b_corpus, corpus_cols)
    # generation counter advanced once per wave on both sides
    for root in roots.values():
        assert list_versions(os.path.join(root, "corpus")) == list(
            range(1, N_WAVES + 2)
        )

    # per-batch outputs identical: packed training stream + index delta
    packed_cols = ["doc_id", "chunk_id", "pack_group", "seq_bin", "n_tokens"]
    for w in range(N_WAVES):
        for sub, cols in (
            (os.path.join("packed", f"batch_id={w}"), packed_cols),
            (
                os.path.join("delta", f"batch_id={w}", "kept_docs"),
                corpus_cols,
            ),
            (
                os.path.join("delta", f"batch_id={w}", "span_grams"),
                ["gh"],
            ),
        ):
            s = spark.read.parquet(os.path.join(roots["stream"], sub))
            b = spark.read.parquet(os.path.join(roots["batch"], sub))
            assert _rows(s, cols) == _rows(b, cols), f"wave {w}: {sub}"

    # the run was not vacuous: every wave appended survivors, and the
    # dedup-vs-archive path dropped at least one batch doc overall
    total_kept = 0
    for w in range(N_WAVES):
        kept = spark.read.parquet(
            os.path.join(roots["stream"], "delta", f"batch_id={w}", "kept_docs")
        ).count()
        total_kept += kept
        assert kept > 0, f"wave {w} kept nothing"
    n_batch_docs = sum(
        len(ws) for ws in wave_doc_ids(sf_dir, NEW_BATCH_MOD, N_WAVES)
    )
    assert total_kept < n_batch_docs, (
        "no batch doc was ever gated or deduped away — pins nothing"
    )


def test_stream_agrees_with_catalog_incremental_entry(spark, sf_dir, roots):
    """Run as ONE wave, the stream must produce exactly the catalog
    entry's packed rows (`corpus_prepare_incremental`, driver-oracled):
    same gate, same index, same batch — the streaming machinery is
    pure delivery."""
    import __spark_entry__ as m

    root = roots["stream"] + "_onewave"
    init_prepared_state(spark, sf_dir, root, NEW_BATCH_MOD)
    run_corpus_prepare_stream(
        spark, sf_dir, root, NEW_BATCH_MOD, n_waves=1
    )
    packed_cols = ["doc_id", "chunk_id", "pack_group", "seq_bin", "n_tokens"]
    got = spark.read.parquet(os.path.join(root, "packed", "batch_id=0"))
    want = m.queries()["corpus_prepare_incremental"](spark, sf_dir)
    assert _rows(got, packed_cols) == _rows(want, packed_cols)
    shutil.rmtree(root)


def test_micro_batch_retry_is_idempotent(spark, sf_dir, roots):
    """Re-running the LAST wave's foreachBatch body with the same
    batch_id (the crash-retry case) must leave every read-visible
    artifact bit-identical: overwrites replace their own output and
    the self-excluding reads keep the retry blind to its first
    attempt."""
    root = roots["stream"]
    corpus_root = os.path.join(root, "corpus")
    before_corpus = _rows(
        read_table(spark, corpus_root), ["doc_id", "text"]
    )
    packed_dir = os.path.join(root, "packed", f"batch_id={N_WAVES - 1}")
    packed_cols = ["doc_id", "chunk_id", "pack_group", "seq_bin", "n_tokens"]
    before_packed = _rows(spark.read.parquet(packed_dir), packed_cols)

    prepare_micro_batch(
        _wave_df(spark, sf_dir, N_WAVES - 1), N_WAVES - 1, root
    )

    assert (
        _rows(read_table(spark, corpus_root), ["doc_id", "text"])
        == before_corpus
    )
    assert _rows(spark.read.parquet(packed_dir), packed_cols) == before_packed
