"""dbsink_spark — a PySpark-native streaming ETL + analytics engine.

Re-expresses the capabilities of the reference sink (a Kafka→Postgres
row-at-a-time Python sink, see /root/reference) as an idiomatic Spark
engine:

* Structured Streaming Kafka source → mapping transform → batched
  upsert sink (``foreachBatch``), replacing the reference's
  one-SQL-round-trip-per-message loop (reference: dbsink/listen.py:159-186).
* A mapping-class plugin system mirroring the reference's ``BaseMap``
  contract (reference: dbsink/maps.py:22-81) where each mapping declares a
  schema and a DataFrame→DataFrame transform.
* A batch/analytical operator library (joins, aggregates, windows,
  dedup, similarity search, text analysis) designed for 100 TB scale.
"""

import logging

__version__ = "0.1.0"

L = logging.getLogger("dbsink_spark")
if not L.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(name)s %(message)s"))
    L.addHandler(_h)
L.setLevel(logging.INFO)
