"""data_engineering_challenge_spark — a PySpark-native analytics engine.

Re-implements the query and data-processing capabilities of the reference
`Genebio/Data_Engineering_challenge` (an IHC-attribution batch ETL pipeline:
journey building -> fractional-credit attribution -> channel reporting),
rebuilt Spark-first:

* DataFrame / Spark SQL everywhere -> Catalyst handles pushdown, pruning,
  join selection, AQE skew handling.  No driver-side row loops.
* The reference's O(C*S) driver-side as-of loop (reference
  pipeline/cj_builder.py:81-109) becomes a single distributed equi-join with
  a range residual (operators/journeys.py).
* The reference's external HTTP attribution API (pipeline/api_client.py)
  becomes a native window-function operator family (operators/attribution.py)
  plus an optional partition-parallel external-scorer mode
  (operators/batching.py).
* The 3-CTE SQLite report (pipeline/channel_reporter.py:33-93) becomes a
  broadcast-aware join/agg chain (operators/report.py).

Plus the LLM-data-pipeline extensions: dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding cosine), similarity search, text analysis, and
multimodal column plumbing (operators/dedup.py, similarity.py, text.py,
multimodal.py).
"""

__version__ = "0.1.0"
