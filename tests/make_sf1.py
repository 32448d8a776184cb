"""Synthesize an sfN testdata directory (COPIES x sf0.1) for the
scaling bench points (SCALE.md / VERDICT r6 item 6).

The driver only generates sf0.001/0.01/0.1, so the 10x point is built
from sf0.1 with the scaling model a real corpus follows:

- ``events``: 10 copies, event_id/user_id offset by their strides —
  10x the KEY population with per-key history size constant (the way
  traffic actually grows; naive replication without user offsets would
  instead deepen every per-key window 10x).
- ``documents``: 10 copies, doc_id offset; every token of copy i>0 is
  prefixed with a copy letter, so copies are NOT near-duplicates of
  each other — the within-copy duplicate structure replicates 10x,
  the cross-copy Jaccard is ~0 (naive replication would hand every
  doc 9 exact twins and blow the verify stage up quadratically in a
  way no real corpus does).
- ``embeddings``: 10 copies, vec_id offset, dimensions rotated by i
  (norms and label structure preserved, neighbors shuffled).
- ``customer``: 10 copies, c_custkey offset by the user stride so the
  events⋈customer repair semantics keep their sf0.1 proportions.
- remaining TPC-H tables: copied verbatim (loader warmup only; no
  sf1-benched key reads them).

Usage: python tests/make_sf1.py [out_dir] [copies] [honest]
(defaults /tmp/testdata_sf1, 10; e.g. `/tmp/testdata_sf10 100` for the
second scaling decade). Idempotent; ~30 MB per 10 copies.
Deterministic (pure SQL, no RNG).

``honest`` (the stopword-honest mode, VERDICT r10 item 5): leave the
gate-lexicon tokens (STOPWORDS ∪ LANG_MARKERS, operators/text.py)
UNPREFIXED in the copies, so stopword/marker-based absolute gates
(corpus_keep_flags: gopher ∧ lang-id ∧ …) keep sf-PROPORTIONAL
survivors instead of copy-0 only — the measurement-fidelity fix for
keys whose cost is dominated by SURVIVOR-side work. Cross-copy
near-dup structure stays dead: isolated shared stopwords almost never
form a full shared shingle, and the non-lexicon token mass still
diverges per copy (test_make_sfn_honest.py pins both)."""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10  # overridable via argv[2]
STRIDES = {
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
    "customer": {"c_custkey": 15_000},
}
VERBATIM = ["region", "nation", "supplier", "part", "orders", "lineitem"]


def _copy_tag(i: int) -> str:
    """Copy tag: two letters while the run's COPIES fits base-26²
    (676), else fixed-width three letters for every copy — widths must
    not MIX within one directory (a 2-letter tag + token could equal a
    3-letter tag + shorter token, re-creating exactly the cross-copy
    shingle overlap the tag exists to kill). The r9 sf100 decade
    (COPIES=1000) is the first 3-letter user."""
    if COPIES <= 676:
        return chr(97 + i // 26) + chr(97 + i % 26)
    return (
        chr(97 + i // 676)
        + chr(97 + (i // 26) % 26)
        + chr(97 + i % 26)
    )


HONEST_STOPWORDS = False  # set by build(); argv[3] == "honest"


def _keep_tokens() -> list[str]:
    """The gate lexicon (stopwords + language markers), longest-first
    so the unprefix alternation can't stop at a shorter prefix word
    (RE2 alternation is leftmost-FIRST, not longest)."""
    from aggregator_spark.operators.text import LANG_MARKERS, STOPWORDS

    keep = set(STOPWORDS)
    for markers in LANG_MARKERS.values():
        keep |= set(markers)
    return sorted(keep, key=lambda t: (-len(t), t))


# script is runnable from anywhere (the sweep protocol): make the
# repo importable for the lexicon import above
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _doc_text(i: int) -> str:
    """Copy-i text expression: token-prefix with the copy tag, so
    cross-copy shingle overlap is ~0 while within-copy duplicate
    structure replicates. Honest mode then UN-prefixes the gate
    lexicon (a prefixed original token can't false-match: the \\b
    after the alternation fails inside a longer word, and tag+word
    only equals a different tag+word across widths the _copy_tag
    docstring already forbids)."""
    if i == 0:
        return "text"
    backref = "\\1"
    expr = (
        f"regexp_replace(text, '([a-z0-9]+)', '{_copy_tag(i)}{backref}', 'g')"
    )
    if HONEST_STOPWORDS:
        alt = "|".join(_keep_tokens())
        expr = (
            f"regexp_replace({expr}, "
            f"'\\b{_copy_tag(i)}({alt})\\b', '{backref}', 'g')"
        )
    return expr


def _emb_expr(i: int) -> str:
    """Copy-i embedding: rotate dimensions by i mod 63 (norms and
    label structure preserved, neighbors shuffled; rotation 0 keeps
    the original)."""
    r = i % 63
    if r == 0:
        return "embedding"
    return f"embedding[{r + 1}:64] || embedding[1:{r}]"


def build(out_dir: str, copies: int = COPIES, honest: bool = False) -> None:
    global COPIES, HONEST_STOPWORDS
    COPIES = copies
    HONEST_STOPWORDS = honest
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()

    # ≤200 UNION ALL branches per statement: a single 1000-branch
    # union (sf100, COPIES=1000) exceeds DuckDB's parser expression
    # depth; chunked INSERTs into a temp table keep the identical
    # per-copy SQL while staying shallow.
    CHUNK = 200

    def chunk_sql(table: str, select_i, lo: int, hi: int) -> str:
        return "\nUNION ALL\n".join(
            select_i(i, f"'{SRC}/{table}.parquet'") for i in range(lo, hi)
        )

    sql = {
        "events": lambda i, src: f"""
            SELECT event_id + {i * STRIDES['events']['event_id']} AS event_id,
                   ts,
                   user_id + {i * STRIDES['events']['user_id']} AS user_id,
                   event_type, value, props
            FROM {src}""",
        "documents": lambda i, src: f"""
            SELECT doc_id + {i * STRIDES['documents']['doc_id']} AS doc_id,
                   {_doc_text(i)} AS text,
                   lang, source, n_chars
            FROM {src}""",
        "embeddings": lambda i, src: f"""
            SELECT vec_id + {i * STRIDES['embeddings']['vec_id']} AS vec_id,
                   {_emb_expr(i)} AS embedding,
                   label
            FROM {src}""",
        "customer": lambda i, src: f"""
            SELECT c_custkey + {i * STRIDES['customer']['c_custkey']}
                     AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM {src}""",
    }
    for table, select_i in sql.items():
        out = os.path.join(out_dir, f"{table}.parquet")
        con.execute("DROP TABLE IF EXISTS _sfn_build")
        con.execute(
            "CREATE TABLE _sfn_build AS "
            + chunk_sql(table, select_i, 0, min(CHUNK, COPIES))
        )
        for lo in range(CHUNK, COPIES, CHUNK):
            con.execute(
                "INSERT INTO _sfn_build "
                + chunk_sql(table, select_i, lo, min(lo + CHUNK, COPIES))
            )
        con.execute(
            f"COPY _sfn_build TO '{out}' (FORMAT PARQUET)"
        )
        con.execute("DROP TABLE _sfn_build")
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows")
    for table in VERBATIM:
        shutil.copy(
            os.path.join(SRC, f"{table}.parquet"),
            os.path.join(out_dir, f"{table}.parquet"),
        )
    # embeddings keep float32 and 64 dims?  cast back in case the list
    # slice widened the type
    print("sf1 dir ready:", out_dir)


if __name__ == "__main__":
    build(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1",
        int(sys.argv[2]) if len(sys.argv) > 2 else 10,
        honest=(len(sys.argv) > 3 and sys.argv[3] == "honest"),
    )
