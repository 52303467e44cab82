import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
from apache_druid_spark import get_spark
from apache_druid_spark.model.datasource import DatasourceRegistry
from apache_druid_spark.sql import dialect
from apache_druid_spark.sql.dialect import druid_sql, translate
from pyspark.sql import types as T
from test_golden_foo import FOO_ROWS, FOO_SCHEMA
from test_golden_query3 import NUMFOO_ROWS, NUMFOO_SCHEMA

spark = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
r = DatasourceRegistry(spark)
r.register("foo", spark.createDataFrame(FOO_ROWS, FOO_SCHEMA))
r.register("numfoo", spark.createDataFrame(NUMFOO_ROWS, NUMFOO_SCHEMA))
r.register_view("cview", "SELECT SUBSTRING(bar.dim1, 1, 1) AS dim1_firstchar, bar.dim2 as dim2, dnf.l2 as l2 FROM (SELECT * from foo WHERE dim2 = 'a') as bar INNER JOIN druid.numfoo dnf ON bar.dim2 = dnf.dim2")
druid_sql(spark, "SELECT 1 FROM foo LIMIT 1", r).collect()
q = ("SELECT COUNT(*) FROM view.cview as a INNER JOIN druid.foo d on d.dim2 = a.dim2 "
     "WHERE a.dim1_firstchar <> 'z' OR a.dim1_firstchar IS NULL")
t = translate(q)
mv_by_table = spark._druid_sql_mv_cols[1]
print("mv_by_table:", mv_by_table)
t2 = dialect._rewrite_mv_semantics(t, ("dim2","dim3"), mv_by_table)
print("SQL:", t2)
df = spark.sql(t2)
df.explain()
t0 = time.time(); print(df.collect(), time.time()-t0)
