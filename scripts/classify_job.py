"""spark-submit entry: full classification job over a documents table.

Usage: spark-submit --py-files python_fmask_spark.zip classify_job.py SF_DIR
Prints per-class counts as one JSON line.
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = SparkSession.builder.appName("fmask-classify").getOrCreate()
    from python_fmask_spark import pipeline
    from python_fmask_spark.sources import register_views

    register_views(spark, sf_dir)
    out = pipeline.classify(spark)
    counts = {str(r.fmask_class): r["count"]
              for r in out.groupBy("fmask_class").count().collect()}
    print(json.dumps({"sf_dir": sf_dir, "class_counts": counts}))
    spark.stop()


if __name__ == "__main__":
    main()
