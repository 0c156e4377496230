from eggv_spark.sources.readers import (  # noqa: F401
    read_gtf,
    read_gvf,
    read_processed_tsv,
    read_table,
)
from eggv_spark.sources.writers import write_tsv  # noqa: F401
