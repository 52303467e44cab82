"""Druid native expression translator tests (SURVEY.md §2.12).

Mirrors semantics asserted in the reference's FunctionTest/ExprTest
(core/src/test/java/org/apache/druid/math/expr/FunctionTest.java).
"""

import pytest
from pyspark.sql import functions as F

from apache_druid_spark.operators.expressions import compile_expression


def _one(spark, expr_text):
    return spark.range(1).select(
        compile_expression(expr_text).alias("v")).collect()[0]["v"]


@pytest.mark.parametrize("expr,expected", [
    ("1 + 2 * 3", 7),
    ("(1 + 2) * 3", 9),
    ("2 ^ 10", 1024.0),
    ("7 % 3", 1),
    ("div(7, 2)", 3),
    ("abs(-5)", 5),
    ("floor(3.7)", 3),
    ("ceil(3.2)", 4),
    ("round(3.456, 2)", 3.46),
    ("max(3, 9)", 9),
    ("min(3, 9)", 3),
    ("sqrt(16.0)", 4.0),
    ("mod(10, 3)", 1),
    ("bitwiseAnd(12, 10)", 8),
    ("bitwiseOr(12, 10)", 14),
    ("bitwiseXor(12, 10)", 6),
    ("bitwiseShiftLeft(1, 4)", 16),
    # IEEE-754 helpers (Function.java GetExponent/Ulp/NextUp/Scalb)
    ("scalb(3.0, 4)", 48.0),
    ("ulp(1.0)", 2.220446049250313e-16),
    ("ulp(0.0)", 5e-324),
    ("getExponent(8.0)", 3),
    ("getExponent(7.9)", 2),
    ("getExponent(0.0)", -1023),
    ("nextUp(1.0)", 1.0000000000000002),
])
def test_math(spark, expr, expected):
    assert _one(spark, expr) == expected


@pytest.mark.parametrize("expr,expected", [
    ("concat('a', 'b', 'c')", "abc"),
    ("strlen('hello')", 5),
    ("upper('ab')", "AB"),
    ("lower('AB')", "ab"),
    ("substring('hello', 1, 3)", "ell"),
    ("substring('hello', 1, -1)", "ello"),
    ("strpos('hello', 'llo')", 2),
    ("strpos('hello', 'zzz')", -1),
    ("left('hello', 2)", "he"),
    ("right('hello', 2)", "lo"),
    ("replace('aaa', 'a', 'b')", "bbb"),
    ("trim('  x  ')", "x"),
    ("repeat('ab', 3)", "ababab"),
    ("lpad('7', 3, '0')", "007"),
    ("reverse('abc')", "cba"),
    ("regexp_extract('foo123bar', '([0-9]+)', 1)", "123"),
    ("regexp_like('foo123', '[0-9]+')", True),
    ("contains_string('hello', 'ell')", True),
    ("icontains_string('HELLO', 'ell')", True),
    ("parse_long('42')", 42),
])
def test_string(spark, expr, expected):
    assert _one(spark, expr) == expected


@pytest.mark.parametrize("expr,expected", [
    ("if(1 == 1, 'y', 'n')", "y"),
    ("if(1 == 2, 'y', 'n')", "n"),
    ("nvl(null, 'd')", "d"),
    ("coalesce(null, null, 3)", 3),
    ("isnull(null)", True),
    ("notnull(1)", True),
    ("case_searched(1 == 2, 'a', 1 == 1, 'b', 'c')", "b"),
    ("case_simple('x', 'x', 'matched', 'other')", "matched"),
    ("1 == 1 && 2 == 2", True),
    ("1 == 2 || 2 == 2", True),
    ("!(1 == 1)", False),
])
def test_control(spark, expr, expected):
    assert _one(spark, expr) == expected


@pytest.mark.parametrize("expr,expected", [
    ("array_length([1,2,3])", 3),
    ("array_offset([10,20,30], 1)", 20),
    ("array_ordinal([10,20,30], 1)", 10),
    ("array_contains([1,2,3], 2)", True),
    ("array_overlap([1,2], [2,3])", True),
    ("array_offset_of([10,20,30], 20)", 1),
    ("array_append([1,2], 3)", [1, 2, 3]),
    ("array_prepend(0, [1,2])", [0, 1, 2]),
    ("array_concat([1], [2,3])", [1, 2, 3]),
    ("array_to_string([1,2,3], ',')", "1,2,3"),
    ("array_slice([1,2,3,4], 1, 3)", [2, 3]),
    ("fold((x, acc) -> x + acc, [1,2,3], 0)", 6),
    ("map(x -> x * 2, [1,2,3])", [2, 4, 6]),
    ("filter(x -> x > 1, [1,2,3])", [2, 3]),
    ("any(x -> x > 2, [1,2,3])", True),
    ("all(x -> x > 2, [1,2,3])", False),
    # ApplyFunction.java CartesianMapFunction / CartesianFoldFunction
    ("cartesian_map((x, y) -> x + y, [1,2], [10,20])", [11, 21, 12, 22]),
    ("cartesian_fold((x, y, acc) -> acc + x * y, [1,2], [3,4], 0)", 21),
])
def test_array_and_lambda(spark, expr, expected):
    assert _one(spark, expr) == expected


@pytest.mark.parametrize("expr,expected", [
    ("timestamp_extract(timestamp_parse('2024-03-15T13:45:10'), 'HOUR')", 13),
    ("timestamp_extract(timestamp_parse('2024-03-15T13:45:10'), 'YEAR')", 2024),
    ("timestamp_format(timestamp_parse('2024-03-15T13:45:10'), 'yyyy-MM-dd')",
     "2024-03-15"),
    ("ipv4_parse('192.168.0.1')", 3232235521),
    ("ipv4_stringify(3232235521)", "192.168.0.1"),
    ("ipv4_match('192.168.0.55', '192.168.0.0/24')", True),
    ("ipv4_match('10.0.0.1', '192.168.0.0/24')", False),
])
def test_time_misc(spark, expr, expected):
    assert _one(spark, expr) == expected


def test_timestamp_floor_period(spark):
    assert str(_one(
        spark,
        "timestamp_floor(timestamp_parse('2024-03-15T13:45:00'), 'PT6H')"
    )) == "2024-03-15 12:00:00"
    assert str(_one(
        spark,
        "timestamp_floor(timestamp_parse('2024-05-15T13:45:00'), 'P3M')"
    )) == "2024-04-01 00:00:00"


def test_column_reference(spark):
    rows = (spark.range(5)
            .select(compile_expression("if(id > 2, id * 10, id)").alias("v"))
            .collect())
    assert [r["v"] for r in rows] == [0, 1, 2, 30, 40]


def test_bitwise_convert_round_trip(spark):
    """BITWISE_CONVERT_DOUBLE_TO_LONG_BITS / LONG_BITS_TO_DOUBLE are
    exact IEEE-754 reinterpretation in pure arithmetic (registry.py) —
    verified against Python's struct for normals, subnormals, extremes,
    signed zero, infinities and NaN
    (BitwiseConvertDoubleToLongBitsOperatorConversion)."""
    import random
    import struct

    from apache_druid_spark.model.datasource import DatasourceRegistry
    from apache_druid_spark.sql.dialect import druid_sql

    def d2l(x):
        return struct.unpack(">q", struct.pack(">d", x))[0]

    def l2d(b):
        return struct.unpack(">d", struct.pack(">q", b))[0]

    reg = DatasourceRegistry(spark)
    reg.register("one", spark.createDataFrame([(1,)], "x long"))
    rng = random.Random(7)
    vals = [1.0, -1.0, 0.5, 2.0, 3.5, 1e-320, -1e-320, 5e-324,
            1.7976931348623157e308, 2.2250738585072014e-308,
            123456.789, 3.141592653589793]
    vals += [rng.uniform(-1e9, 1e9) for _ in range(12)]
    vals += [l2d(rng.getrandbits(62)) for _ in range(12)]
    exprs = ", ".join(
        f"BITWISE_CONVERT_DOUBLE_TO_LONG_BITS(double('{v!r}')) AS b{i},"
        f" BITWISE_CONVERT_LONG_BITS_TO_DOUBLE({d2l(v)}) AS d{i}"
        for i, v in enumerate(vals))
    row = druid_sql(spark, f"SELECT {exprs} FROM one", reg).first()
    for i, v in enumerate(vals):
        assert row[f"b{i}"] == d2l(v), (v, row[f"b{i}"], d2l(v))
        assert row[f"d{i}"] == v, (v, row[f"d{i}"])
    row = druid_sql(spark, """
        SELECT BITWISE_CONVERT_DOUBLE_TO_LONG_BITS(double('NaN')) AS n,
               BITWISE_CONVERT_DOUBLE_TO_LONG_BITS(double('-0.0')) AS z,
               BITWISE_CONVERT_DOUBLE_TO_LONG_BITS(double('Infinity'))
                   AS p,
               BITWISE_CONVERT_LONG_BITS_TO_DOUBLE(9221120237041090560)
                   AS nd
        FROM one""", reg).first()
    assert row["n"] == 9221120237041090560       # canonical NaN
    assert row["z"] == -9223372036854775808      # -0.0 sign bit
    assert row["p"] == 9218868437227405312       # +Infinity
    assert row["nd"] != row["nd"]                # NaN round-trips


def test_bitwise_convert_native_expression_path(spark):
    """The native expression language's bitwiseConvert* (math-expr
    docs) shares the exact-arithmetic construction with the SQL
    macros."""
    import struct

    from apache_druid_spark.operators.expressions import (
        compile_expression,
    )

    def d2l(v):
        return struct.unpack(">q", struct.pack(">d", v))[0]

    df = spark.createDataFrame([(1,)], "x long")
    vals = [1.0, -2.5, 5e-324, 1.7976931348623157e308, 3.141592653]
    cols = {}
    for i, v in enumerate(vals):
        cols[f"b{i}"] = compile_expression(
            f"bitwiseConvertDoubleToLongBits({v!r})")
        cols[f"d{i}"] = compile_expression(
            f"bitwiseConvertLongBitsToDouble({d2l(v)})")
    row = df.select([c.alias(n) for n, c in cols.items()]).first()
    for i, v in enumerate(vals):
        assert row[f"b{i}"] == d2l(v)
        assert row[f"d{i}"] == v


def test_next_after(spark):
    """nextAfter via long-bits adjacency (Math.nextAfter semantics)."""
    import math

    from apache_druid_spark.operators.expressions import (
        compile_expression,
    )

    df = spark.createDataFrame([(1,)], "x long")
    cases = [(1.0, 2.0), (1.0, 0.5), (-1.0, 0.0), (0.0, -1.0),
             (0.0, 1.0), (3.5, 3.5), (-2.25, -9.0)]
    cols = {f"c{i}": compile_expression(f"nextAfter({a!r}, {b!r})")
            for i, (a, b) in enumerate(cases)}
    row = df.select([c.alias(n) for n, c in cols.items()]).first()
    for i, (a, b) in enumerate(cases):
        assert row[f"c{i}"] == math.nextafter(a, b), (a, b)


def test_next_up_exact(spark):
    """nextUp is exact at negative powers of two (where the spacing
    halves and the old d + ulp(d) form overstepped one ulp)."""
    import math

    from apache_druid_spark.operators.expressions import (
        compile_expression,
    )

    df = spark.createDataFrame([(1,)], "x long")
    vals = [-1.0, -0.5, -0.25, -(2.0 ** -1022), 1.0, 0.5]
    cols = {f"c{i}": compile_expression(f"nextUp({v!r})")
            for i, v in enumerate(vals)}
    row = df.select([c.alias(n) for n, c in cols.items()]).first()
    for i, v in enumerate(vals):
        assert row[f"c{i}"] == math.nextafter(v, math.inf), v
