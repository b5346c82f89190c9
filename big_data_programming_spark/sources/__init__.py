"""Sources & sinks (SURVEY.md §2.1 S1-S9)."""

from big_data_programming_spark.sources.loaders import (  # noqa: F401
    TABLES,
    load,
    load_all,
    read_csv,
    read_json,
    register_views,
)
from big_data_programming_spark.sources.schemas import SCHEMAS  # noqa: F401
