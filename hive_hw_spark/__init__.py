"""hive_hw_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine providing the query and data-processing
capabilities of the reference telemetry pipeline (chix/hive-hw, surveyed in
SURVEY.md) generalized to a full OLAP + LLM-data-pipeline operator surface:

- batch OLAP: scans, filters, joins (incl. as-of / range), aggregations,
  window functions, sort/limit/top-k, set ops, scalar function families
- streaming: tumbling/sliding/session windows, watermarks, stateful gather
- UDF surface: pandas UDFs, grouped map, mapInPandas, SQL UDFs, UDTFs
- LLM-pipeline ops: exact/near dedup, similarity search, text analysis,
  multimodal binary columns

Everything is declarative DataFrame/Spark SQL so Catalyst/Tungsten/AQE pick
the physical strategy; Python UDFs appear only where built-ins cannot
express the semantics (and then always Arrow-batched).
"""

from hive_hw_spark.session import get_spark
from hive_hw_spark.catalog import TABLES, register_tables

__all__ = ["get_spark", "register_tables", "TABLES"]
__version__ = "0.1.0"
