from gcp_data_engineering_workshop_spark.sources.ticks import ticks, replay_minute  # noqa: F401
