"""Shared column-reference helper: Druid column names are flat, so a
dot (join prefixes like "j0.col") is part of the name — backtick-quote
to stop Spark parsing it as struct access."""

from pyspark.sql import Column
from pyspark.sql import functions as F


def fcol(name: str) -> Column:
    if "." in name:
        return F.col(f"`{name}`")
    return F.col(name)
