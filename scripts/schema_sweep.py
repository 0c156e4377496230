"""Registry-wide output-schema audit (VERDICT r03, ask 4).

Builds every ``queries()`` entry at sf0.001 and flags any output
column whose type the driver's pandas canonicalizer cannot sort/hash:
ArrayType, MapType, StructType.  Obtaining ``.schema`` only requires
CONSTRUCTING each DataFrame, but a handful of side-effectful entries
(stream_late_data, tbl_partition_overwrite, stream_cdc_apply,
src_format_roundtrip, stream_index_dedup, ...) run streaming queries
or write filesystem sinks inside the builder itself, so a full sweep
does execute those — budget a few minutes, not seconds.
The round-3 driver error on ``txt_hashed_features`` (ArrayType
``feature_vec`` -> ``TypeError: unhashable type: 'list'``) is the
failure mode this sweep catches at staging time.

Usage: python scripts/schema_sweep.py [query ...]
With no arguments the whole registry is swept; names restrict the
sweep to those queries (stage_gate passes the rotation window).
Exit 0 = zero non-scalar output columns in the swept set.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as S

import __spark_entry__ as entrymod
from eggv_spark.session import get_session

COMPLEX = (S.ArrayType, S.MapType, S.StructType)


def main() -> int:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.001")
    spark = get_session(
        "schema-sweep", master="local[8]", shuffle_partitions=8,
        extra_confs={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    bad, errs = [], []
    qs = entrymod.queries()
    only = set(sys.argv[1:])
    if only:
        qs = {n: f for n, f in qs.items() if n in only}
    for name, fn in qs.items():
        try:
            schema = fn(spark, sf_dir).schema
        except Exception as exc:  # noqa: BLE001
            errs.append((name, str(exc)[:120]))
            continue
        complex_cols = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in schema.fields
            if isinstance(f.dataType, COMPLEX)
        ]
        if complex_cols:
            bad.append((name, complex_cols))
            print(f"COMPLEX  {name}: {complex_cols}")
    spark.stop()

    for name, e in errs:
        print(f"ERROR    {name}: {e}")
    print(
        f"\n{len(qs)} queries swept: {len(bad)} with non-scalar output "
        f"columns, {len(errs)} build errors"
    )
    return 1 if (bad or errs) else 0


if __name__ == "__main__":
    raise SystemExit(main())
