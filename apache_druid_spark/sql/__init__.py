from apache_druid_spark.sql.dialect import druid_sql

__all__ = ["druid_sql"]
