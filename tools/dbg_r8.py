"""Debug harness for the r8 red goldens: print translated SQL + result."""
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from datetime import datetime
from pyspark.sql import SparkSession, types as T
from apache_druid_spark.model.datasource import DatasourceRegistry
from apache_druid_spark.sql import dialect
from apache_druid_spark.sql.dialect import druid_sql, translate

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())

from test_golden_foo import FOO_ROWS, FOO_SCHEMA
from test_golden_query3 import NUMFOO_ROWS, NUMFOO_SCHEMA, FOO2_ROWS, FOO2_SCHEMA

reg = DatasourceRegistry(spark)
reg.register("foo", spark.createDataFrame(FOO_ROWS, FOO_SCHEMA))
reg.register("numfoo", spark.createDataFrame(NUMFOO_ROWS, NUMFOO_SCHEMA))
reg.register("foo2", spark.createDataFrame(
    FOO2_ROWS, T._parse_datatype_string(FOO2_SCHEMA)))
reg.register_lookup("lookyloo", {"a": "xa", "abc": "xabc",
                                 "nosuchkey": "mysteryvalue", "6": "x6"})

QUERIES = {
    "union_mapping": """
        SELECT dim1, dim2, SUM(m1), COUNT(*)
        FROM (SELECT dim1, dim2, m1 FROM foo
              UNION ALL SELECT dim1, dim2, m1 FROM numfoo)
        WHERE dim2 = 'a' OR dim2 = 'def'
        GROUP BY 1, 2
    """,
    "union_mismatch": """
        SELECT dim3, dim2, SUM(m1), COUNT(*)
        FROM (SELECT dim3, dim2, m1 FROM foo2
              UNION ALL SELECT dim3, dim2, m1 FROM numfoo)
        WHERE dim2 = 'a' OR dim2 = 'en'
        GROUP BY 1, 2
    """,
    "inner_sort": """
        SELECT dim1, dim2 FROM druid.foo
         WHERE dim2 IN (
           SELECT dim2 FROM druid.foo GROUP BY dim2
           ORDER BY dim2 DESC
         )
    """,
    "semi_join": """
        SELECT COUNT(*)
        FROM (
          SELECT DISTINCT dim2
          FROM druid.foo
          WHERE SUBSTRING(dim2, 1, 1) IN (
            SELECT SUBSTRING(dim1, 1, 1) FROM druid.foo
            WHERE dim1 <> '')
        )
    """,
    "acd_builtin": "SELECT APPROX_COUNT_DISTINCT_BUILTIN(dim2) FROM druid.foo",
}

name = sys.argv[1] if len(sys.argv) > 1 else None
for k, q in QUERIES.items():
    if name and k != name:
        continue
    print("=" * 70)
    print("##", k)
    t = translate(q)
    mv = ("dim2", "dim3") if "foo2" not in q else ("dim2", "dim3")
    # mimic druid_sql scoping
    names = tuple(reg.names())
    import re
    spans = dialect._string_spans(t)
    referenced = tuple(
        n for n in names
        if any(not any(a <= m.start() <= b for a, b in spans)
               for m in re.finditer(rf"(?<![\w.$]){re.escape(n)}(?![\w$])",
                                    t, re.IGNORECASE)))
    mv_cols = dialect._mv_string_columns(reg, referenced)
    print("referenced:", referenced, "mv_cols:", mv_cols)
    print("-- translated+mv:")
    print(dialect._rewrite_mv_semantics(t, mv_cols))
    try:
        out = druid_sql(spark, q, reg).collect()
        print("-- result:", [tuple(r) for r in out])
    except Exception as e:
        print("-- ERROR:", str(e).split("\n")[0][:300])

# --- r8 view/join debug ---
if name == "vj":
    reg.register_view(
        "cview",
        "SELECT SUBSTRING(bar.dim1, 1, 1) AS dim1_firstchar, "
        "bar.dim2 as dim2, dnf.l2 as l2 "
        "FROM (SELECT * from foo WHERE dim2 = 'a') as bar "
        "INNER JOIN druid.numfoo dnf ON bar.dim2 = dnf.dim2")
    import time
    t0 = time.time()
    df = druid_sql(spark, "SELECT * FROM view.cview", reg)
    print("cview rows:", df.collect(), time.time() - t0)
    q = ("SELECT COUNT(*) FROM view.cview as a "
         "INNER JOIN druid.foo d on d.dim2 = a.dim2 "
         "WHERE a.dim1_firstchar <> 'z' OR a.dim1_firstchar IS NULL")
    t0 = time.time()
    out = druid_sql(spark, q, reg).collect()
    print("view_and_join:", out, time.time() - t0)
if name == "sj":
    import time
    t0 = time.time()
    out = druid_sql(spark, "SELECT COUNT(*) FROM foo x, foo y WHERE x.dim1 = y.dim2", reg).collect()
    print("self_join:", out, time.time() - t0)
if name == "vj2":
    reg.register_view(
        "cview",
        "SELECT SUBSTRING(bar.dim1, 1, 1) AS dim1_firstchar, "
        "bar.dim2 as dim2, dnf.l2 as l2 "
        "FROM (SELECT * from foo WHERE dim2 = 'a') as bar "
        "INNER JOIN druid.numfoo dnf ON bar.dim2 = dnf.dim2")
    druid_sql(spark, "SELECT 1 FROM foo LIMIT 1", reg).collect()  # force registration
    q = ("SELECT COUNT(*) FROM view.cview as a "
         "INNER JOIN druid.foo d on d.dim2 = a.dim2 "
         "WHERE a.dim1_firstchar <> 'z' OR a.dim1_firstchar IS NULL")
    t = translate(q)
    cache = spark._druid_sql_mv_cols
    mv_by_table = cache[1]
    print("mv_by_table:", mv_by_table)
    print("alias map:", dialect._alias_mv_map(t, ("dim2","dim3"), mv_by_table))
    print(dialect._rewrite_mv_semantics(t, ("dim2", "dim3"), mv_by_table))
if name == "vj3":
    reg.register_view(
        "cview",
        "SELECT SUBSTRING(bar.dim1, 1, 1) AS dim1_firstchar, "
        "bar.dim2 as dim2, dnf.l2 as l2 "
        "FROM (SELECT * from foo WHERE dim2 = 'a') as bar "
        "INNER JOIN druid.numfoo dnf ON bar.dim2 = dnf.dim2")
    druid_sql(spark, "SELECT 1 FROM foo LIMIT 1", reg).collect()
    print("view_names:", reg.view_names())
    try:
        print("schema:", spark.table("view_cview").schema.simpleString())
    except Exception as e:
        print("table err:", str(e)[:200])
if name == "vj4":
    reg.register_view(
        "aview",
        "SELECT SUBSTRING(dim1, 1, 1) AS dim1_firstchar FROM foo "
        "WHERE dim2 = 'a'")
    reg.register_view(
        "cview",
        "SELECT SUBSTRING(bar.dim1, 1, 1) AS dim1_firstchar, "
        "bar.dim2 as dim2, dnf.l2 as l2 "
        "FROM (SELECT * from foo WHERE dim2 = 'a') as bar "
        "INNER JOIN druid.numfoo dnf ON bar.dim2 = dnf.dim2")
    reg.register_view(
        "dview",
        "SELECT SUBSTRING(dim1, 1, 1) AS numfoo FROM foo "
        "WHERE dim2 = 'a'")
    import time
    q = ("SELECT COUNT(*) FROM view.cview as a "
         "INNER JOIN druid.foo d on d.dim2 = a.dim2 "
         "WHERE a.dim1_firstchar <> 'z' OR a.dim1_firstchar IS NULL")
    t0 = time.time()
    df = druid_sql(spark, q, reg)
    print("translate+plan time:", time.time() - t0)
    t0 = time.time()
    print("rows:", df.collect(), "exec:", time.time() - t0)
