"""Query result serialization formats.

Reference: sql/src/main/java/org/apache/druid/sql/http/SqlResource.java:72-110
and ResultFormat.java — object / array / objectLines / arrayLines / csv,
optionally with a header row.
"""

from __future__ import annotations

import csv
import io
import json
from datetime import date, datetime

from pyspark.sql import DataFrame


def _jsonable(v):
    if isinstance(v, (datetime, date)):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    if hasattr(v, "asDict"):
        return {k: _jsonable(x) for k, x in v.asDict().items()}
    return v


# Spark dtype -> (Druid native type, SQL type) for the typesHeader /
# sqlTypesHeader rows (sql/.../http/ResultFormat + ObjectWriter:
# __time is natively LONG / SQL TIMESTAMP; MV strings type STRING)
_HEADER_TYPES = {
    "string": ("STRING", "VARCHAR"),
    "bigint": ("LONG", "BIGINT"),
    "int": ("LONG", "INTEGER"),
    "smallint": ("LONG", "SMALLINT"),
    "tinyint": ("LONG", "TINYINT"),
    "double": ("DOUBLE", "DOUBLE"),
    "float": ("FLOAT", "FLOAT"),
    "timestamp": ("LONG", "TIMESTAMP"),
    "date": ("LONG", "DATE"),
    "boolean": ("LONG", "BOOLEAN"),
    "array<string>": ("STRING", "ARRAY"),
    "binary": ("COMPLEX", "OTHER"),
}


def _header_types(df: DataFrame) -> tuple[list[str], list[str]]:
    druid, sql = [], []
    for _name, dtype in df.dtypes:
        d, s = _HEADER_TYPES.get(dtype, ("COMPLEX", "OTHER"))
        druid.append(d)
        sql.append(s)
    return druid, sql


def format_results(df: DataFrame, fmt: str = "object",
                   header: bool = False, types_header: bool = False,
                   sql_types_header: bool = False) -> str:
    """Serialize a result DataFrame in a Druid ResultFormat. With
    ``header``, ``types_header`` / ``sql_types_header`` add the Druid
    native-type and SQL-type header rows (array/csv formats) or the
    per-column type objects in the first line (object-lines formats) —
    SqlResourceTest testArrayResultFormatWithHeader /
    testCsvResultFormatWithHeaders /
    testObjectLinesResultFormatWithFullHeader."""
    cols = df.columns
    dts, sts = _header_types(df)
    rows = [[_jsonable(v) for v in r] for r in df.collect()]
    if fmt == "object":
        return json.dumps([dict(zip(cols, r)) for r in rows])
    if fmt == "array":
        out = []
        if header:
            out.append(cols)
            if types_header:
                out.append(dts)
            if sql_types_header:
                out.append(sts)
        return json.dumps(out + rows)
    if fmt == "objectLines":
        lines = []
        if header:
            if types_header or sql_types_header:
                hdr = {c: ({} if not (types_header or sql_types_header)
                           else {**({"type": d} if types_header else {}),
                                 **({"sqlType": s} if sql_types_header
                                    else {})})
                       for c, d, s in zip(cols, dts, sts)}
            else:
                hdr = {c: None for c in cols}
            lines.append(json.dumps(hdr))
        lines += [json.dumps(dict(zip(cols, r))) for r in rows]
        return "\n".join(lines)
    if fmt == "arrayLines":
        lines = []
        if header:
            lines.append(json.dumps(cols))
            if types_header:
                lines.append(json.dumps(dts))
            if sql_types_header:
                lines.append(json.dumps(sts))
        lines += [json.dumps(r) for r in rows]
        return "\n".join(lines)
    if fmt == "csv":
        buf = io.StringIO()
        w = csv.writer(buf)
        if header:
            w.writerow(cols)
            if types_header:
                w.writerow(dts)
            if sql_types_header:
                w.writerow(sts)
        for r in rows:
            w.writerow(["" if v is None else v for v in r])
        return buf.getvalue()
    raise ValueError(f"unknown result format: {fmt!r}")
