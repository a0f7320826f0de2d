"""dbt_eamples_spark — a PySpark-native analytics engine.

From-scratch re-expression of the query and data-processing
capabilities of the reference repo (kojnmastyr/dbt-eamples): a
metric/semantic query layer, a SQL execution surface (multi-statement
scripts), an incremental watermark/delta/append dataflow, plus
LLM-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal columns) — all built on the Spark DataFrame/SQL
API so Catalyst/AQE/Tungsten own the physical execution.

Design rules (enforced across the package):
 - DataFrame/SQL only; no RDDs.
 - Built-in ``pyspark.sql.functions`` in every hot path; Pandas UDFs
   only where built-ins cannot express the semantics.
 - Broadcast hints on dimension joins; AQE on; explicit aliases on
   every computed column (oracle contract).
 - No ``collect()`` inside operators — only at presentation edges.
"""

from dbt_eamples_spark.session import get_spark
from dbt_eamples_spark.catalog import register_tables, TABLES

__all__ = ["get_spark", "register_tables", "TABLES"]
__version__ = "0.1.0"
