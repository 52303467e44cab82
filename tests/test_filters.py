"""DimFilter compiler tests (SURVEY.md §2.4) on the `foo` golden fixture
— multi-value ANY-match semantics mirror the reference's
CalciteMultiValueStringQueryTest expectations."""

from apache_druid_spark.operators.filters import compile_filter


def _dim1s(foo, flt, registry=None):
    df = foo
    rows = df.filter(compile_filter(flt, df, registry)).select("dim1").collect()
    return sorted(r["dim1"] for r in rows)


def test_selector(foo):
    assert _dim1s(foo, {"type": "selector", "dimension": "dim1", "value": "abc"}) == ["abc"]


def test_selector_null(foo):
    # null array AND empty array rows both behave as a null value
    # (Druid ingests [] as a no-value row)
    flt = {"type": "selector", "dimension": "dim2", "value": None}
    rows = foo.filter(compile_filter(flt, foo)).select("dim1").collect()
    assert sorted(r["dim1"] for r in rows) == ["10.1", "abc"]


def test_in(foo):
    flt = {"type": "in", "dimension": "dim1", "values": ["abc", "def", "nope"]}
    assert _dim1s(foo, flt) == ["abc", "def"]


def test_bound_numeric(foo):
    flt = {"type": "bound", "dimension": "m1", "lower": "2", "upper": "4",
           "ordering": "numeric"}
    assert _dim1s(foo, flt) == ["1", "10.1", "2"]


def test_bound_numeric_strict(foo):
    flt = {"type": "bound", "dimension": "m1", "lower": "2", "upper": "4",
           "lowerStrict": True, "upperStrict": True, "ordering": "numeric"}
    assert _dim1s(foo, flt) == ["2"]


def test_bound_lexicographic(foo):
    flt = {"type": "bound", "dimension": "dim1", "lower": "a", "upper": "e"}
    assert _dim1s(foo, flt) == ["abc", "def"]


def test_like(foo):
    assert _dim1s(foo, {"type": "like", "dimension": "dim1", "pattern": "a%"}) == ["abc"]


def test_regex(foo):
    flt = {"type": "regex", "dimension": "dim1", "pattern": "^[0-9]+$"}
    assert _dim1s(foo, flt) == ["1", "2"]


def test_search_contains(foo):
    flt = {"type": "search", "dimension": "dim1",
           "query": {"type": "insensitive_contains", "value": "B"}}
    assert _dim1s(foo, flt) == ["abc"]


def test_and_or_not(foo):
    flt = {"type": "and", "fields": [
        {"type": "not", "field": {"type": "selector", "dimension": "dim1", "value": "abc"}},
        {"type": "or", "fields": [
            {"type": "selector", "dimension": "dim1", "value": "def"},
            {"type": "selector", "dimension": "dim1", "value": "2"},
        ]},
    ]}
    assert _dim1s(foo, flt) == ["2", "def"]


def test_interval(foo):
    flt = {"type": "interval", "dimension": "__time",
           "intervals": ["2000-01-01T00:00:00Z/2001-01-01T00:00:00Z"]}
    assert _dim1s(foo, flt) == ["", "10.1", "2"]


def test_expression_filter(foo):
    flt = {"type": "expression", "expression": "m1 > 4.5"}
    assert _dim1s(foo, flt) == ["abc", "def"]


def test_column_comparison(foo):
    flt = {"type": "columnComparison", "dimensions": ["m1", "m2"]}
    assert len(_dim1s(foo, flt)) == 6  # m1 == m2 on every row


def test_multivalue_any_match(foo):
    # dim3 = ['a','b'] / ['b','c'] / ['d'] / [''] / [] / null
    flt = {"type": "selector", "dimension": "dim3", "value": "b"}
    assert _dim1s(foo, flt) == ["", "10.1"]


def test_multivalue_in(foo):
    flt = {"type": "in", "dimension": "dim3", "values": ["c", "d"]}
    assert _dim1s(foo, flt) == ["10.1", "2"]


def test_extraction_fn_on_filter(foo):
    flt = {"type": "selector", "dimension": "dim1", "value": "AB",
           "extractionFn": {"type": "substring", "index": 0, "length": 2}}
    # upper not applied; substring('abc')='ab' != 'AB'
    assert _dim1s(foo, flt) == []
    flt2 = {"type": "selector", "dimension": "dim1", "value": "ab",
            "extractionFn": {"type": "substring", "index": 0, "length": 2}}
    assert _dim1s(foo, flt2) == ["abc"]


def test_true_false(foo):
    assert len(_dim1s(foo, {"type": "true"})) == 6
    assert _dim1s(foo, {"type": "false"}) == []


def test_spatial_polygon(spark):
    # unrolled even-odd ray cast (PolygonBound.java) vs a pure-python
    # reference over a point grid, including edge-adjacent points
    absc, ordi = [2.0, 8.0, 8.0, 2.0], [2.0, 3.0, 9.0, 7.0]

    def py_inside(x, y):
        inside = False
        n = len(absc)
        for i in range(n):
            j = (i - 1) % n
            xi, yi, xj, yj = absc[i], ordi[i], absc[j], ordi[j]
            if (yi > y) != (yj > y):
                slope = (xj - xi) / (yj - yi)
                if x < (y - yi) * slope + xi:
                    inside = not inside
        return inside

    pts = [(float(x), float(y)) for x in range(11) for y in range(11)]
    df = spark.createDataFrame(
        [(f"{x},{y}", x, y) for x, y in pts], "coord string, x double, y double")
    flt = {"type": "spatial", "dimension": "coord",
           "bound": {"type": "polygon", "abscissa": absc, "ordinate": ordi}}
    got = {(r["x"], r["y"]) for r in
           df.filter(compile_filter(flt, df)).select("x", "y").collect()}
    want = {(x, y) for x, y in pts if py_inside(x, y)}
    assert got == want and len(want) > 5


def test_bloom_dim_filter(spark):
    from apache_druid_spark.functions.bloom import bloom_build, bloom_contains
    keys = [str(i) for i in range(50)]
    ser = bloom_build(keys, m_bits=512)
    assert all(bloom_contains(k, ser) for k in keys)  # no false negatives
    df = spark.createDataFrame([(str(i),) for i in range(200)], "k string")
    flt = {"type": "bloom", "dimension": "k", "bloomKFilter": ser}
    got = {r["k"] for r in df.filter(compile_filter(flt, df)).collect()}
    want = {str(i) for i in range(200) if bloom_contains(str(i), ser)}
    assert set(keys) <= got == want
