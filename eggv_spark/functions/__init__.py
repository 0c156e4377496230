from eggv_spark.functions.extract import (  # noqa: F401
    regexp_extract_null,
    strip_prefix_cast_long,
)
