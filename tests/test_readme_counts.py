"""README's catalog counts are DERIVED, not hand-maintained (ADVICE r7):
the stated totals must equal the live catalog, and the rows-only list
must equal the entries that actually lack an oracle."""

from __future__ import annotations

import os
import re

import __spark_entry__ as entry_mod

README = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "README.md"
)


def test_readme_counts_match_catalog():
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    text = open(README).read()
    m = re.search(
        r"(\d+) catalog entries total, (\d+) DuckDB-oracled", text
    )
    assert m, "README no longer states the catalog counts"
    assert int(m.group(1)) == len(qs), (
        f"README says {m.group(1)} entries, catalog has {len(qs)}"
    )
    assert int(m.group(2)) == len(osql), (
        f"README says {m.group(2)} oracled, catalog has {len(osql)}"
    )
    # the named rows-only set is exactly the oracle-less entries
    assert set(qs) - set(osql) == {
        "ann_topk_lsh",
        "ann_topk_ivf",
        "approx_distinct_daily",
        "approx_quantiles_daily",
        "hll_monthly_users",
    }
