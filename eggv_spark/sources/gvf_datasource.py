"""Custom Python DataSource (Spark 4 DataSource API): a GVF-aware
format registered as ``spark.read.format("eggv_gvf")``.

The built-in CSV reader covers GVF fine (sources/readers.read_gvf);
this connector exists for the cases a generic reader can't express:

- per-FILE partitioning (one task per chromosome file — mirrors the
  reference's per-chromosome fan-out, ``eggv/pipeline.py:177``),
  which is the right split for gzipped inputs a byte-range splitter
  can't subdivide;
- format-aware row handling: ``#`` directives dropped at the source
  and the 9 GVF columns typed before Spark sees the rows, so a
  malformed file fails AT THE SCAN with the file path in the error.

Arrow-batched: ``read`` yields pyarrow RecordBatches (the fast path
of the Python DataSource API — tuple-yielding readers pay per-row
pickling).
"""

from __future__ import annotations

import glob as globmod
import gzip
import io

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

#: GVF columns (reference eggv/process.py:39-49).
GVF_DDL = (
    "seqid string, source string, type string, start long, end long, "
    "score string, strand string, phase string, attr string"
)


class GvfDataSource(DataSource):
    """``spark.read.format("eggv_gvf").load(path_or_glob)``."""

    @classmethod
    def name(cls) -> str:
        return "eggv_gvf"

    def schema(self) -> str:
        return GVF_DDL

    def reader(self, schema: StructType) -> "GvfReader":
        return GvfReader(schema, self.options)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class GvfReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("eggv_gvf requires a path")

    def partitions(self):
        # One partition per file: correct granularity for .gz inputs
        # (non-splittable) and preserves per-chromosome task mapping.
        paths = sorted(globmod.glob(self.path)) or [self.path]
        return [_FilePartition(p) for p in paths]

    def read(self, partition: _FilePartition):
        import pyarrow as pa

        opener = gzip.open if partition.path.endswith(".gz") else open
        cols: list[list] = [[] for _ in range(9)]
        with opener(partition.path, "rb") as fh:
            for raw in io.TextIOWrapper(fh, encoding="utf-8"):
                if raw.startswith("#"):
                    continue
                parts = raw.rstrip("\n").split("\t")
                if len(parts) != 9:
                    raise ValueError(
                        f"{partition.path}: expected 9 GVF fields, "
                        f"got {len(parts)}: {raw[:80]!r}"
                    )
                for i, v in enumerate(parts):
                    cols[i].append(v)
        arrays = [
            pa.array(cols[0], pa.string()),
            pa.array(cols[1], pa.string()),
            pa.array(cols[2], pa.string()),
            pa.array([int(x) for x in cols[3]], pa.int64()),
            pa.array([int(x) for x in cols[4]], pa.int64()),
            pa.array(cols[5], pa.string()),
            pa.array(cols[6], pa.string()),
            pa.array(cols[7], pa.string()),
            pa.array(cols[8], pa.string()),
        ]
        yield pa.RecordBatch.from_arrays(
            arrays, names=[f.name for f in self.schema.fields]
        )


def register(spark) -> None:
    """Idempotently register the format on a session."""
    spark.dataSource.register(GvfDataSource)
