from apache_druid_spark.operators.expressions import compile_expression
from apache_druid_spark.operators.filters import compile_filter

__all__ = ["compile_expression", "compile_filter"]
