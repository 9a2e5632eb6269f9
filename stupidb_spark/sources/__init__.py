"""Sources: fixture-table catalog + generic readers.

The reference's only source is an iterable of dicts
(`stupidb/api.py:102-131`, `stupidb/core.py:77-91`). Spark gives us real
connectors; we expose explicit-schema parquet readers for the driver's
fixture star schema plus generic csv/json/parquet/orc/text/rows entry
points.
"""

from stupidb_spark.sources.catalog import (
    FIXTURE_SCHEMAS,
    TABLE_NAMES,
    load_table,
    load_tables,
    register_views,
)
from stupidb_spark.sources.readers import (
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_text,
    table_from_rows,
)

__all__ = [
    "FIXTURE_SCHEMAS",
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "read_csv",
    "read_json",
    "read_orc",
    "read_parquet",
    "read_text",
    "table_from_rows",
]
