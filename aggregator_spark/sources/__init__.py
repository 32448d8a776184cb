from aggregator_spark.sources.datapackage import (
    datapackage_schema,
    read_datapackage_resource,
)
from aggregator_spark.sources.manifest import create_manifest, manifest_paths
from aggregator_spark.sources.logentry import read_logentry_csv
from aggregator_spark.sources.csv_sink import write_single_csv

__all__ = [
    "datapackage_schema",
    "read_datapackage_resource",
    "create_manifest",
    "manifest_paths",
    "read_logentry_csv",
    "write_single_csv",
]
