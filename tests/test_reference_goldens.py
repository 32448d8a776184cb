"""The reference's own test suite, ported golden-for-golden.

Every expected tuple list below is taken verbatim from
reference tests/aggregation_tests.py (cited per test); inputs are the
same inline CSVs. The reference asserted on Postgres insert order —
here the ordered DataFrame's collect() order carries the same guarantee
(O1: date DESC, country ASC, asn ASC, risk ASC).
"""

from __future__ import annotations

import datetime

from textwrap import dedent

from aggregator_spark.operators.aggregate import aggregate_counts
from aggregator_spark.operators.amplify import amplified_counts
from aggregator_spark.sources.logentry import logentry_from_rows

# amplification fixture, reference tests/aggregation_tests.py:27-33
RISK_FACTORS = [
    (1, 41.0),
    (2, 556.9),
    (4, 6.3),
    (5, 30.8),
]


def _dim_risk(spark):
    return spark.createDataFrame(
        RISK_FACTORS, "id int, amplification_factor double"
    )


def _rows(df):
    return [tuple(r) for r in df.collect()]


def _dt(y, m, d):
    return datetime.datetime(y, m, d)


def test_group_by_day(spark):
    # reference tests/aggregation_tests.py:94-117
    scan_csv = dedent(
        """\
        ts,ip,risk_id,asn,cc
        2016-09-20T00:00:01+00:00,71.3.0.1,2,12252,US
        2016-09-20T00:00:01+00:00,190.81.134.82,2,12252,US
        2016-09-29T00:00:01+00:00,190.81.135.11,2,12252,US
        """
    )
    out = aggregate_counts(logentry_from_rows(spark, scan_csv), threshold=0)
    assert _rows(out) == [
        (_dt(2016, 9, 29), 2, "US", 12252, 1, 0.0),
        (_dt(2016, 9, 20), 2, "US", 12252, 2, 0.0),
    ]


def test_group_by_distinct_ip(spark):
    # reference tests/aggregation_tests.py:120-143
    scan_csv = dedent(
        """\
        ts,ip,risk_id,asn,cc
        2016-09-20T00:00:01+00:00,190.81.135.11,2,12252,US
        2016-09-20T00:00:01+00:00,190.81.135.11,2,12252,US
        2016-09-29T00:00:01+00:00,190.81.135.11,2,12252,US
        """
    )
    out = aggregate_counts(logentry_from_rows(spark, scan_csv), threshold=0)
    assert _rows(out) == [
        (_dt(2016, 9, 29), 2, "US", 12252, 1, 0.0),
        (_dt(2016, 9, 20), 2, "US", 12252, 1, 0.0),
    ]


def test_end_to_end_aggregation_order(spark):
    # reference tests/aggregation_tests.py:223-275 — 17 rows (one dup) →
    # 16 golden rows asserted IN ORDER (date DESC, country, asn, risk)
    days = ["2016-09-29", "2016-09-28"]
    lines = ["ts,ip,risk_id,asn,cc"]
    lines.append("2016-09-29T00:00:01+00:00,190.81.134.82,2,12252,US")  # dup
    for day in days:
        for risk in (2, 1):
            lines += [
                f"{day}T00:00:01+00:00,190.81.134.82,{risk},12252,US",
                f"{day}T00:00:01+00:00,190.81.134.82,{risk},122,US",
                f"{day}T00:00:01+00:00,190.81.134.83,{risk},1225,DE",
                f"{day}T00:00:01+00:00,190.81.134.83,{risk},1224,DE",
            ]
    out = aggregate_counts(
        logentry_from_rows(spark, "\n".join(lines)), threshold=0
    )
    expected = []
    for d in (29, 28):
        for country, asns in (("DE", (1224, 1225)), ("US", (122, 12252))):
            for asn in asns:
                for risk in (1, 2):
                    expected.append(
                        (_dt(2016, 9, d), risk, country, asn, 1, 0.0)
                    )
    assert _rows(out) == expected


def test_amplified_count(spark):
    # reference tests/aggregation_tests.py:278-308
    scan_csv = dedent(
        """\
        ts,ip,risk_id,asn,cc
        2016-09-28T00:00:01+00:00,71.3.0.1,1,4444,US
        2016-09-28T00:00:01+00:00,71.3.0.1,2,4444,US
        2016-09-28T00:00:01+00:00,71.3.0.1,4,4444,US
        2016-09-28T00:00:01+00:00,71.3.0.1,5,4444,US
        """
    )
    fact = aggregate_counts(logentry_from_rows(spark, scan_csv), threshold=0)
    out = amplified_counts(fact, _dim_risk(spark)).orderBy("risk")
    assert _rows(out) == [
        (_dt(2016, 9, 28), 1, "US", 4444, 1, 41.0),
        (_dt(2016, 9, 28), 2, "US", 4444, 1, 556.9),
        (_dt(2016, 9, 28), 4, "US", 4444, 1, 6.3),
        (_dt(2016, 9, 28), 5, "US", 4444, 1, 30.8),
    ]


def test_amplified_count_when_grouped(spark):
    # reference tests/aggregation_tests.py:311-351
    ips = {
        1: ["71.3.0.1", "71.3.0.2", "71.3.0.3"],
        2: ["71.3.0.1", "71.3.0.2"],
        4: ["71.3.0.1", "71.3.0.2", "71.3.0.3", "71.3.0.4"],
        5: ["71.3.0.1", "71.3.0.1", "71.3.0.2", "71.3.0.3", "71.3.0.4"],
    }
    lines = ["ts,ip,risk_id,asn,cc"]
    for risk, ip_list in ips.items():
        for ip in ip_list:
            lines.append(f"2016-09-28T00:00:01+00:00,{ip},{risk},4444,US")
    fact = aggregate_counts(
        logentry_from_rows(spark, "\n".join(lines)), threshold=0
    )
    out = amplified_counts(fact, _dim_risk(spark)).orderBy("risk")
    assert _rows(out) == [
        (_dt(2016, 9, 28), 1, "US", 4444, 3, 41.0 * 3),
        (_dt(2016, 9, 28), 2, "US", 4444, 2, 556.9 * 2),
        (_dt(2016, 9, 28), 4, "US", 4444, 4, 6.3 * 4),
        (_dt(2016, 9, 28), 5, "US", 4444, 4, 30.8 * 4),
    ]


def test_unmatched_risk_keeps_placeholder(spark):
    # UPDATE-FROM keep-old-value semantics (reference main.py:219-229):
    # risk 99 has no dim row → count_amplified stays at the 0.0 placeholder
    scan_csv = dedent(
        """\
        ts,ip,risk_id,asn,cc
        2016-09-28T00:00:01+00:00,71.3.0.1,99,4444,US
        """
    )
    fact = aggregate_counts(logentry_from_rows(spark, scan_csv), threshold=0)
    out = amplified_counts(fact, _dim_risk(spark))
    assert _rows(out) == [(_dt(2016, 9, 28), 99, "US", 4444, 1, 0.0)]


def test_having_threshold_strictly_greater(spark):
    # threshold default semantics: count(*) > t, not >= (main.py:64-69, 213)
    scan_csv = dedent(
        """\
        ts,ip,risk_id,asn,cc
        2016-09-28T00:00:01+00:00,71.3.0.1,1,4444,US
        2016-09-28T00:00:01+00:00,71.3.0.2,1,4444,US
        2016-09-28T00:00:01+00:00,71.3.0.1,2,4444,US
        """
    )
    out = aggregate_counts(logentry_from_rows(spark, scan_csv), threshold=1)
    assert _rows(out) == [(_dt(2016, 9, 28), 1, "US", 4444, 2, 0.0)]


def test_prod_timestamp_format(spark):
    # Redshift TIMEFORMAT 'auto' accepts `2016-08-05 02:00:06.0+00`
    # (reference README.md:20-22) alongside ISO-T (SURVEY.md §7 item 5)
    scan_csv = dedent(
        """\
        ts,ip,risk_id,asn,cc
        2016-08-05 02:00:06.0+00,69.2.0.0,2,27005,US
        2016-08-05T23:59:59+00:00,69.2.0.1,2,27005,US
        """
    )
    out = aggregate_counts(logentry_from_rows(spark, scan_csv), threshold=0)
    assert _rows(out) == [(_dt(2016, 8, 5), 2, "US", 27005, 2, 0.0)]
