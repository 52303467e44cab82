from apache_druid_spark.plans.compiler import compile_query, resolve_datasource

__all__ = ["compile_query", "resolve_datasource"]
