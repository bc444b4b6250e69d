"""Dump ``.explain("formatted")`` for named registry queries to files.

Usage: python tools/plan_dump.py <out_dir> <suffix> [name ...]
Writes <out_dir>/<name>_<suffix>.txt for each query.  The plan is taken
from the DataFrame the builder returns (eager side effects — index
builds, probe collects — run as part of building, exactly as in the
bench), at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""
import os
import sys

sys.path.insert(0, ".")
from dask_relabeling_spark.plans import REGISTRY  # noqa: E402
from dask_relabeling_spark.session import (  # noqa: E402
    get_spark, release_persists)


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or list(REGISTRY)
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn, _ = REGISTRY[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {plan.count('Exchange')} Exchange, "
              f"{plan.count('BatchEvalPython')} BatchEvalPython, "
              f"{plan.count('ArrowEvalPython')} ArrowEvalPython, "
              f"-> {path}")
        release_persists()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
