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


def format_results(df: DataFrame, fmt: str = "object",
                   header: bool = False) -> str:
    """Serialize a result DataFrame in a Druid ResultFormat."""
    cols = df.columns
    rows = [[_jsonable(v) for v in r] for r in df.collect()]
    if fmt == "object":
        return json.dumps([dict(zip(cols, r)) for r in rows])
    if fmt == "array":
        out = ([cols] if header else []) + rows
        return json.dumps(out)
    if fmt == "objectLines":
        return "\n".join(json.dumps(dict(zip(cols, r))) for r in rows)
    if fmt == "arrayLines":
        lines = ([json.dumps(cols)] if header else [])
        lines += [json.dumps(r) for r in rows]
        return "\n".join(lines)
    if fmt == "csv":
        buf = io.StringIO()
        w = csv.writer(buf)
        if header:
            w.writerow(cols)
        for r in rows:
            w.writerow(["" if v is None else v for v in r])
        return buf.getvalue()
    raise ValueError(f"unknown result format: {fmt!r}")
