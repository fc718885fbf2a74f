from fraud_detection_spark.sources.tables import (
    TABLES,
    events_with_time,
    load_table,
    register_views,
)

__all__ = ["TABLES", "events_with_time", "load_table", "register_views"]
