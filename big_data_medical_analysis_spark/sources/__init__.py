"""Source connectors: schema-checked readers for the engine's table formats."""

from big_data_medical_analysis_spark.sources.readers import (  # noqa: F401
    load_tables,
    read_binary_dir,
    read_csv,
    read_json,
    read_table,
)
