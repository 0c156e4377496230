"""eggv_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of treynr/eggv (reference studied at
/root/reference/), re-expressed Spark-first.

Design notes
------------
The reference is a Dask-based batch ETL pipeline (GVF/GTF genomic
builds -> regex field extraction -> explode -> left join -> dedup ->
TSV).  This engine expresses every reference operator as a composable
``DataFrame -> DataFrame`` function built on the DataFrame API so that
Catalyst/AQE handle column pruning, predicate pushdown, broadcast join
selection and shuffle sizing.  Beyond parity it adds the operator
families a large-scale training-data pipeline needs: exact/near
deduplication, similarity search, multimodal column plumbing, text
analysis, and event/time analytics (batch + Structured Streaming).
"""

__version__ = "0.1.0"

from eggv_spark.session import get_session  # noqa: F401
