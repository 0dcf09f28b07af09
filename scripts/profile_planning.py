"""Where does materialize_pass1 time go: Catalyst analysis/optimization
of the giant features SQL vs actual execution? And how much of it is the
per-pixel angle-DN expression stack?"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from python_fmask_spark import derive, pipeline  # noqa: E402
from python_fmask_spark.dialect import SPARK  # noqa: E402
from python_fmask_spark.session import get_spark  # noqa: E402
from python_fmask_spark.sources import register_views  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="profile-planning")
register_views(spark, sf_dir)
spark.sql("SELECT count(*) FROM documents").collect()


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label:50s} {dt:7.2f}s")
    return out


p1_sql = "WITH " + ",\n".join([
    derive.features_sql(SPARK, derive.documents_wide_sql(SPARK)),
    derive.pass1_sql(SPARK),
]) + " SELECT * FROM pass1"
print("pass1 SQL chars:", len(p1_sql))

df = t("parse+analyze pass1 SQL", lambda: spark.sql(p1_sql))
t("execute (localCheckpoint)", lambda: df.localCheckpoint())

# same chain with the satsel angle-DN columns stripped from features
import re  # noqa: E402

feat = derive.features_sql(SPARK, derive.documents_wide_sql(SPARK))
sat_names = list(derive.sat_angle_px_exprs(SPARK))
satsel = ", ".join(f"{e} AS {n}"
                   for n, e in derive.sat_angle_px_exprs(SPARK).items())
feat_noang = feat.replace(", " + satsel, "")
assert len(feat_noang) < len(feat), "strip failed"
zeros = ", ".join(f"0 AS {n}" for n in sat_names)
feat_noang = feat_noang.replace("SELECT *, 0 AS dummy", "x")  # no-op guard
feat_noang = re.sub(r"features AS \(\n  SELECT \*",
                    f"features AS (\n  SELECT *, {zeros}", feat_noang)
p1_noang = ("WITH " + ",\n".join([feat_noang, derive.pass1_sql(SPARK)])
            + " SELECT * FROM pass1")
print("no-angle SQL chars:", len(p1_noang))
df2 = t("parse+analyze pass1 SQL (angles stubbed)", lambda: spark.sql(p1_noang))
t("execute (localCheckpoint, angles stubbed)", lambda: df2.localCheckpoint())

# tail planning cost over the materialized leaf
view = pipeline.materialize_pass1(spark)
tail = pipeline.tail_sql_from_pass1(
    view, "pass3", "SELECT count(*) AS n FROM pass3")
df3 = t("parse+analyze pass3 tail", lambda: spark.sql(tail))
t("execute pass3 tail", lambda: df3.collect())
spark.stop()
