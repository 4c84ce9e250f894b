from azurestorage_blueprints_spark.sources.io import (  # noqa: F401
    read_table,
    write_table,
)
