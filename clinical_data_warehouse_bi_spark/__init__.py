"""PySpark-native analytics engine with the capabilities of
Leemc7/Clinical-Data-Warehouse-BI (a pure-SQL MariaDB dimensional
warehouse: staging ETL -> star schema -> QA reconciliation), rebuilt
Spark-first and extended with large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing).

Layout:
  session.py   SparkSession factory (AQE, UTC, sane shuffle partitions)
  io.py        parquet sources/sinks + catalog helpers
  cleanse.py   cleansing expressions (sentinel timestamps, keyword
               filters, regex-guarded numeric parse, calendar attrs)
  keys.py      surrogate-key strategies (test-scale + 100TB-scale)
  joins.py     lookup / normalized-string / interval (as-of) /
               null-safe / semi / anti join operators
  agg.py       aggregation operators (count-distinct exact+approx,
               dup probes, reconciliation)
  qa.py        the reference's QA suite as reusable DataFrame checks
  star.py      the 3-stage clinical pipeline (staging -> dwh -> agg)
  queries/     registered (query, oracle-SQL) pairs for the driver
  streaming.py Structured Streaming surface
  multimodal.py binary-column (image/audio) plumbing via mapInPandas
"""

__version__ = "0.1.0"
