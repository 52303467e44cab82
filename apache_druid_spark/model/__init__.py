from apache_druid_spark.model.datasource import DatasourceRegistry
from apache_druid_spark.model.granularity import time_floor_col, granularity_to_duration

__all__ = ["DatasourceRegistry", "time_floor_col", "granularity_to_duration"]
