"""Z-order layout: the write-side clustering must (a) preserve the
data exactly and (b) produce measurably narrower parquet row-group
min/max ranges on EVERY interleaved column than an unclustered write —
the data-skipping property that matters at 100 TB. Measured straight
from parquet footers (no data read), same way a reader's row-group
pruner would."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from aggregator_spark.schemas import load_testdata
from aggregator_spark.sources.layout import (
    rowgroup_skip_fraction,
    write_zordered,
    zorder_key,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    # project the two layout dimensions + a payload marker column
    return load_testdata(spark, SF, "events").select(
        "user_id", "value", "event_type"
    )


def _avg_skip(path: str, col: str, probes) -> float:
    return sum(rowgroup_skip_fraction(path, col, p) for p in probes) / len(
        probes
    )


def test_zorder_preserves_rows(spark, events, tmp_path):
    out = str(tmp_path / "z")
    write_zordered(events, out, ["user_id", "value"], n_files=4)
    back = spark.read.parquet(out)
    assert back.columns == events.columns
    a = events.groupBy(events.columns).count()
    b = back.groupBy(back.columns).count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_zorder_skips_on_both_dimensions(spark, events, tmp_path):
    zpath = str(tmp_path / "z")
    upath = str(tmp_path / "u")
    spath = str(tmp_path / "s")
    # 32 files => 32 row groups per layout: a row group must cover a
    # small enough z-curve segment that its per-dimension min/max
    # range is narrow — with 4 row groups each would span the full
    # rank space of both dimensions and nothing could skip (the same
    # reason OPTIMIZE targets a file-size budget, not file count)
    n = 32
    write_zordered(events, zpath, ["user_id", "value"], n_files=n)
    # unclustered baseline: same file count, hash-random row placement
    events.repartition(n).write.parquet(upath)
    # single-column sort baseline: perfect on user_id, blind on value
    (
        events.repartitionByRange(n, "user_id")
        .sortWithinPartitions("user_id")
        .write.parquet(spath)
    )

    users = sorted(
        r[0] for r in events.select("user_id").distinct().collect()
    )
    user_probes = users[:: max(1, len(users) // 10)][:10]
    vals = events.approxQuantile("value", [0.1, 0.3, 0.5, 0.7, 0.9], 0.01)

    z_user = _avg_skip(zpath, "user_id", user_probes)
    u_user = _avg_skip(upath, "user_id", user_probes)
    s_user = _avg_skip(spath, "user_id", user_probes)
    z_val = _avg_skip(zpath, "value", vals)
    u_val = _avg_skip(upath, "value", vals)
    s_val = _avg_skip(spath, "value", vals)

    # random layout skips (nearly) nothing on either column
    assert u_user <= 0.2 and u_val <= 0.2
    # z-order must beat random CLEARLY on both dimensions at once
    assert z_user >= u_user + 0.4, (z_user, u_user)
    assert z_val >= u_val + 0.4, (z_val, u_val)
    # the single-column sort is the ceiling on its own column ...
    assert s_user >= z_user
    # ... and z-order must beat it on the column it is blind to
    assert z_val >= s_val + 0.4, (z_val, s_val)


def test_zorder_key_validation(spark, events):
    with pytest.raises(ValueError):
        zorder_key(events, [])
    with pytest.raises(ValueError):
        zorder_key(events, ["user_id", "value"], bits=32)
