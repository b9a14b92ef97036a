"""Sources: parquet star-schema loaders + panel readers.

Reference parity (§2.1): parquet single-file read, hive-partitioned
glob discovery, in-memory literal frames, parquet write. Spark gets all
of these natively; the helpers here only add the panel column-role
convention on top.
"""

from functime_spark.sources.tables import (  # noqa: F401
    load_events,
    TABLE_NAMES,
    load_table,
    load_tables,
    read_panel,
    events_panel,
    lineitem_panel,
    write_partitioned,
)
