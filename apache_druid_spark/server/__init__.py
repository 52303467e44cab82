"""HTTP facade mirroring the reference's query endpoints."""

from apache_druid_spark.server.http import DruidHttpServer

__all__ = ["DruidHttpServer"]
