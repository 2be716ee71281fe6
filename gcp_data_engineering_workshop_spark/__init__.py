"""PySpark-native analytics engine with the query/data-processing
capabilities of engr-krooozy/gcp-data-engineering-workshop.

The reference is a GCP stock-analytics stack (Cloud Function ingestion
-> Beam/Dataflow streaming pipeline -> BigQuery -> Streamlit dashboard).
This package re-expresses every capability Spark-first: declarative
DataFrame/SQL plans for the batch-checkable surface and Structured
Streaming twins for the streaming path, plus large-scale training-data
pipeline operators (dedup, similarity search, multimodal columns, text
analysis) designed for 100 TB scale.
"""

__version__ = "0.1.0"

from gcp_data_engineering_workshop_spark.session import get_spark  # noqa: F401
from gcp_data_engineering_workshop_spark.catalog import load_table, load_tables  # noqa: F401
