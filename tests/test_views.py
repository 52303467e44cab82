"""SQL views (sql/src/main/java/org/apache/druid/sql/calcite/view/
InProcessViewManager.java, DruidViewMacro): a registered Druid SQL
text expands into the enclosing query's plan; queries reference it as
``view.<name>``. The aview/dview definitions come verbatim from
BaseCalciteQueryTest.java:1028-1052.

DOCUMENTED DIVERGENCE on the ``<> 'z'`` counts: the reference at this
version lowers view filters to native extraction filters with
TWO-valued NOT (null <> 'z' matches — testCountStarOnView expects 2);
this engine keeps standard SQL three-valued logic (null <> 'z' is
unknown, row excluded — count 1), the behavior later reference
versions adopted.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_druid_spark.model.datasource import DatasourceRegistry
from apache_druid_spark.sql.catalog import (
    information_schema_schemata, information_schema_tables,
)
from apache_druid_spark.sql.dialect import druid_sql

from test_golden_foo import FOO_ROWS, FOO_SCHEMA


@pytest.fixture(scope="module")
def reg(spark):
    r = DatasourceRegistry(spark)
    r.register("foo", spark.createDataFrame(FOO_ROWS, FOO_SCHEMA))
    r.register_view(
        "aview",
        "SELECT SUBSTRING(dim1, 1, 1) AS dim1_firstchar FROM foo "
        "WHERE dim2 = 'a'")
    r.register_view(
        "dview",
        "SELECT SUBSTRING(dim1, 1, 1) AS numfoo FROM foo "
        "WHERE dim2 = 'a'")
    return r


def test_count_star_on_view(spark, reg):
    # testCountStarOnView — aview selects rows 1 ('') and 4 ('1');
    # SUBSTRING('', 1, 1) is null (NULL-when-short contract), so the
    # three-valued <> excludes it (reference native NOT counts 2)
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n FROM view.aview WHERE dim1_firstchar <> 'z'
    """, reg).first()
    assert out["n"] == 1


def test_view_equality_filter(spark, reg):
    # deterministic under both logics: the '1' row matches exactly
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n FROM view.aview WHERE dim1_firstchar = '1'
    """, reg).first()
    assert out["n"] == 1


def test_confused_view(spark, reg):
    # testConfusedView — the view aliased AS druid, column qualified
    # through the alias (same three-valued divergence as above)
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n FROM view.dview as druid
        WHERE druid.numfoo <> 'z'
    """, reg).first()
    assert out["n"] == 1


def test_view_join(spark, reg):
    # view joined back to a datasource on the projected column
    out = druid_sql(spark, """
        SELECT COUNT(*) AS n
        FROM view.aview a JOIN foo f ON a.dim1_firstchar = f.dim1
    """, reg).first()
    assert out["n"] == 1


def test_view_select_star(spark, reg):
    out = druid_sql(spark, "SELECT * FROM view.aview ORDER BY 1",
                    reg).collect()
    assert [r.dim1_firstchar for r in out] == [None, "1"]


def test_views_in_catalog(spark, reg):
    s = information_schema_schemata(reg)
    assert "view" in {r["SCHEMA_NAME"] for r in s.collect()}
    t = information_schema_tables(reg)
    got = {(r["TABLE_SCHEMA"], r["TABLE_NAME"]): r["TABLE_TYPE"]
           for r in t.collect()}
    assert got[("view", "aview")] == "VIEW"
    assert got[("view", "dview")] == "VIEW"
