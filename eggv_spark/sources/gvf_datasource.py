"""Python DataSource V2 for GVF — ``spark.read.format("gvf")``.

The extensibility showcase for SURVEY §2.1: the same 9-column GVF
contract as :func:`eggv_spark.sources.readers.read_gvf` (reference
``eggv/process.py:25-61``), registered as a first-class Spark format
through PySpark 4's Python DataSource API instead of a helper
function.  One ``InputPartition`` per input file, so a multi-file
corpus scans in parallel without any driver-side reading; ``.gz``
members decompress inside the partition reader.

When to use which:
- ``read_gvf`` (CSV reader, JVM-side) is the FAST path — whole-stage
  codegen parsing, splittable plain-text files, PERMISSIVE corrupt
  capture.  Use it for bulk processing.
- ``format("gvf")`` is the INTEGRATION path — the format string
  travels through SQL (``CREATE TABLE ... USING gvf``), catalogs,
  and any tooling that only speaks formats.  Rows cross the Python
  boundary via Arrow batches, so per-row cost is higher; the
  partition-per-file split keeps it parallel.

Register once per session with :func:`register_gvf_datasource`.
"""

from __future__ import annotations

import glob
import gzip
import io
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_GVF_DDL = (
    "seqid string, source string, type string, start long, end long,"
    " score string, strand string, phase string, attr string"
)


class _GvfFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class GvfDataSourceReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("gvf datasource requires a path")
        self._path = path

    def _files(self) -> list[str]:
        p = self._path
        if os.path.isdir(p):
            found = sorted(
                f for f in glob.glob(os.path.join(p, "*"))
                if os.path.isfile(f)
            )
        else:
            found = sorted(glob.glob(p)) or [p]
        return found

    def partitions(self):
        # one partition per file: executors read their own files; the
        # driver never opens data (only globs names)
        return [_GvfFilePartition(f) for f in self._files()]

    def read(self, partition):
        path = partition.path
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rb") as fh:
            for raw in io.TextIOWrapper(fh, encoding="utf-8"):
                if not raw or raw.startswith("#"):
                    continue
                parts = raw.rstrip("\n").split("\t")
                if len(parts) != 9:
                    continue  # malformed: same drop the CSV path takes
                try:
                    start, end = int(parts[3]), int(parts[4])
                except ValueError:
                    continue
                yield (
                    parts[0], parts[1], parts[2], start, end,
                    parts[5], parts[6], parts[7], parts[8],
                )


class GvfDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "gvf"

    def schema(self) -> str:
        return _GVF_DDL

    def reader(self, schema):
        return GvfDataSourceReader(self.options)


def register_gvf_datasource(spark) -> None:
    """Idempotent session-level registration of the ``gvf`` format."""
    spark.dataSource.register(GvfDataSource)
