"""Standalone ASN reference-data refresh — the weekly job the reference
ships as a separate entry point (reference load_asn_ref_data.py:8-12,
which instantiates the loader and calls load_ref_data_rds,
main.py:300-328).

The reference downloads the ASN datapackage resource and bulk-loads it
into the serving DB via ``psql \\COPY`` (its 2h push_datapackage path
was replaced by the 5s local-download + COPY). The Spark-first
equivalent reads the datapackage resource straight into a DataFrame
(schema from the descriptor, parallel CSV scan) and publishes it —
JDBC when a serving DB is configured, parquet otherwise. No driver
round-trip, no temp file, no subprocess.

Run:  python -m aggregator_spark.load_asn_ref_data <descriptor> \
          (--jdbc-url URL | --out PATH) [--resource NAME]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from aggregator_spark.sources.datapackage import read_datapackage_resource


def load_asn_ref_data(
    spark: SparkSession,
    descriptor: str | dict,
    resource: str | None = None,
    base: str | None = None,
) -> DataFrame:
    """Read the ASN datapackage resource (number, title, country) —
    the refresh dataset the reference COPYs into data__asn___asn
    (main.py:305-306 CREATE TABLE, :314-326 download + COPY)."""
    return read_datapackage_resource(spark, descriptor, resource, base)


def refresh_dim_asn(
    spark: SparkSession,
    descriptor: str | dict,
    *,
    jdbc_url: str | None = None,
    out_path: str | None = None,
    resource: str | None = None,
    base: str | None = None,
    table: str = "dim_asn",
) -> DataFrame:
    """Full weekly refresh: load + publish. Returns the loaded frame."""
    df = load_asn_ref_data(spark, descriptor, resource, base)
    if jdbc_url is not None:
        from aggregator_spark.sources.jdbc import write_jdbc

        write_jdbc(df, jdbc_url, table, mode="overwrite")
    if out_path is not None:
        df.write.mode("overwrite").parquet(out_path)
    return df


def main(argv: list[str] | None = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("descriptor")
    ap.add_argument("--jdbc-url")
    ap.add_argument("--out")
    ap.add_argument("--resource")
    args = ap.parse_args(argv)
    if not args.jdbc_url and not args.out:
        ap.error("need --jdbc-url and/or --out")
    spark = SparkSession.builder.appName("asn-ref-refresh").getOrCreate()
    df = refresh_dim_asn(
        spark,
        args.descriptor,
        jdbc_url=args.jdbc_url,
        out_path=args.out,
        resource=args.resource,
    )
    print(f"refreshed dim_asn: {df.count()} rows")


if __name__ == "__main__":
    main()
