"""azurestorage_blueprints_spark — a PySpark-native data-pipeline analytics engine.

A brand-new engine (not a port) with the query and data-processing
capabilities of ``shipyardapp/azurestorage-blueprints``: the reference's
file-pipeline verbs (upload / download / move / delete with exact- and
regex-matching, collision-safe renaming, typed error model — see
``/root/reference/azurestorage_blueprints/*.py``) re-expressed as
relational operations over a file-catalog DataFrame, plus the full
relational operator inventory (joins, aggregations, windows, set ops,
string/date/array/JSON functions) and LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) — all
built Spark-first on DataFrame/SQL/Catalyst and designed for 100 TB
scale (no driver-side collection, partition-parallel side effects,
broadcast hints for dims, AQE on).
"""

from azurestorage_blueprints_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
