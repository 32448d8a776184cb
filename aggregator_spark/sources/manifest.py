"""S3 COPY-manifest semantics as an explicit file list.

The reference builds a Redshift COPY manifest from a datapackage
descriptor: flatten ``resources[].path`` (a list of key lists; empty
lists are skipped) into ``{"entries": [{"url", "mandatory": true}]}``
(reference main.py:95-103, golden expectation
tests/aggregation_tests.py:503-525).

Spark needs no manifest file — ``spark.read.csv([paths])`` fails on a
missing path by default, which is exactly ``mandatory: true``. Both forms
are provided: the manifest dict (byte-compatible with the reference's)
and the flat path list to hand to ``spark.read``.
"""

from __future__ import annotations

import json
from posixpath import join

from aggregator_spark.config import as_spark_path


def create_manifest(datapackage_string: str | dict, source: str) -> dict:
    dp = (
        datapackage_string
        if isinstance(datapackage_string, dict)
        else json.loads(datapackage_string)
    )
    entries = [
        {"url": join(source, key), "mandatory": True}
        for res in dp.get("resources", [])
        for key in res.get("path", [])
    ]
    return {"entries": entries}


def manifest_paths(manifest: dict, spark_scheme: bool = True) -> list[str]:
    """Manifest → path list for ``spark.read`` (s3:// → s3a://)."""
    urls = [e["url"] for e in manifest.get("entries", [])]
    return [as_spark_path(u) for u in urls] if spark_scheme else urls
