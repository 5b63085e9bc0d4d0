"""Dump .explain('formatted') for named queries to plans/r20/<q>_<tag>.txt.
Usage: python tools/dump_plans.py <repo_root> <tag> q1 q2 ...
(guide §1: plan evidence for every touched query)."""
import os
import sys

root = sys.argv[1]
tag = sys.argv[2]
names = sys.argv[3:]
sys.path.insert(0, root)

from pyspark.sql import SparkSession  # noqa: E402

from proof_of_concept___cdc_w_iceberg_spark.session import get_spark  # noqa: E402
from proof_of_concept___cdc_w_iceberg_spark import registry  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.environ.get("PLAN_OUT", "/root/repo/plans/r20")
os.makedirs(OUT, exist_ok=True)

spark = get_spark("dump_plans")
spark.sparkContext.setLogLevel("ERROR")
qs = registry.queries()
for n in names:
    try:
        df = qs[n](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
    except Exception as e:  # a query that fails to build still gets a stub
        plan = f"ERROR building {n}: {e}"
    with open(os.path.join(OUT, f"{n}_{tag}.txt"), "w") as f:
        f.write(plan)
    print(n, "->", f"{n}_{tag}.txt", flush=True)
