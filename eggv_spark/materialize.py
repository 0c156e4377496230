"""Intra-query materialization points, cluster-parameterizable.

Every operator that re-consumes an expensive intermediate (shingle
tables, token/vocab frames, iterative round state, the pipeline's
shared typed scan) materializes it through :func:`materialize` /
:func:`materialize_lazy` instead of calling ``localCheckpoint``
directly.  The session conf ``spark.eggv.materialize.mode`` picks the
mechanism WITHOUT changing any plan shape:

- ``local`` (default): ``localCheckpoint`` — executor-local storage
  (MEMORY_AND_DISK), lineage truncated.  Right on local[N] and on
  clusters where re-running the query on executor loss is acceptable
  (the materialization lives inside ONE query invocation, so the
  blast radius of a lost replica is one query retry).
- ``reliable``: ``persist(MEMORY_AND_DISK)`` + reliable ``checkpoint``
  to ``spark.eggv.checkpoint.dir`` (or an already-set
  ``SparkContext.setCheckpointDir``) — survives executor loss, the
  fault-tolerant posture for multi-hour 100 TB runs.  The persist
  keeps the first consumer from recomputing the lineage while the
  checkpoint job writes.

Both modes cut the lineage at the same point, so the logical shape —
N consumers read ONE materialized intermediate instead of recomputing
it — is identical; only the storage/fault-tolerance contract changes.
Nothing here ever crosses a query invocation: each materialization is
created and consumed inside one operator call (no cross-run caching).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

MODE_CONF = "spark.eggv.materialize.mode"
DIR_CONF = "spark.eggv.checkpoint.dir"


def _mode(df: DataFrame) -> str:
    return df.sparkSession.conf.get(MODE_CONF, "local")


def _reliable(df: DataFrame, eager: bool) -> DataFrame:
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is None:
        ckpt_dir = df.sparkSession.conf.get(DIR_CONF, None)
        if not ckpt_dir:
            raise ValueError(
                f"{MODE_CONF}=reliable needs a checkpoint directory: "
                f"set {DIR_CONF} or SparkContext.setCheckpointDir"
            )
        sc.setCheckpointDir(ckpt_dir)
    return df.persist(StorageLevel.MEMORY_AND_DISK).checkpoint(eager=eager)


def materialize(df: DataFrame) -> DataFrame:
    """Eager materialization point (``df.transform(materialize)``)."""
    if _mode(df) == "reliable":
        return _reliable(df, eager=True)
    return df.localCheckpoint(eager=True)


def materialize_lazy(df: DataFrame) -> DataFrame:
    """Lazy lineage-truncation point — materialized on first use by
    the consuming job (iterative rounds build their query through
    these without executing anything)."""
    if _mode(df) == "reliable":
        return _reliable(df, eager=False)
    return df.localCheckpoint(eager=False)
