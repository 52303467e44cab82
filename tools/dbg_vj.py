import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
from apache_druid_spark import get_spark
from apache_druid_spark.model.datasource import DatasourceRegistry
from apache_druid_spark.sql.dialect import druid_sql
from pyspark.sql import types as T
from test_golden_foo import FOO_ROWS, FOO_SCHEMA
from test_golden_query3 import NUMFOO_ROWS, NUMFOO_SCHEMA, FOO2_ROWS, FOO2_SCHEMA

spark = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
r = DatasourceRegistry(spark)
r.register("foo", spark.createDataFrame(FOO_ROWS, FOO_SCHEMA))
r.register("numfoo", spark.createDataFrame(NUMFOO_ROWS, NUMFOO_SCHEMA))
r.register("foo2", spark.createDataFrame(FOO2_ROWS, T._parse_datatype_string(FOO2_SCHEMA)))
r.register_lookup("lookyloo", {"a": "xa", "abc": "xabc"})
r.register_view("aview", "SELECT SUBSTRING(dim1, 1, 1) AS dim1_firstchar FROM foo WHERE dim2 = 'a'")
r.register_view("cview", "SELECT SUBSTRING(bar.dim1, 1, 1) AS dim1_firstchar, bar.dim2 as dim2, dnf.l2 as l2 FROM (SELECT * from foo WHERE dim2 = 'a') as bar INNER JOIN druid.numfoo dnf ON bar.dim2 = dnf.dim2")
r.register_view("dview", "SELECT SUBSTRING(dim1, 1, 1) AS numfoo FROM foo WHERE dim2 = 'a'")
q = ("SELECT COUNT(*) FROM view.cview as a INNER JOIN druid.foo d on d.dim2 = a.dim2 "
     "WHERE a.dim1_firstchar <> 'z' OR a.dim1_firstchar IS NULL")
t0 = time.time(); df = druid_sql(spark, q, r); print("plan:", time.time()-t0)
t0 = time.time(); print(df.collect(), "exec:", time.time()-t0)
