#!/usr/bin/env python3
"""Dump .explain("formatted") for named driver queries to files.

Usage: python tools/dump_plans.py OUTDIR SUFFIX q134_matrix_profile [...]

Writes OUTDIR/<query>_<SUFFIX>.txt with the formatted physical plan of
each named `__spark_entry__.queries()` entry at sf0.001 (plan shape, not
timing). Used to record the before/after plan evidence for optimization
rounds (plans/r09/...).
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.session import get_spark
import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("dump-plans")
    qs = entry_mod.queries()
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not registered in this tree")
            continue
        df = qs[name](spark, SF_DIR)
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
