from apache_druid_spark.functions.registry import register_druid_functions

__all__ = ["register_druid_functions"]
