"""PySpark-native analytics engine with the capabilities of
Leemc7/Clinical-Data-Warehouse-BI (a pure-SQL MariaDB dimensional
warehouse: staging ETL -> star schema -> QA reconciliation), rebuilt
Spark-first and extended with large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing).

Layout:
  session.py   SparkSession factory (AQE, UTC, sane shuffle partitions)
  io.py        parquet/csv/json sources+sinks, catalog DDL, bucketed
               tables, fan_out (adaptive scan rebalance)
  cleanse.py   cleansing expressions (sentinel timestamps, keyword
               filters, regex-guarded numeric parse, calendar attrs)
  keys.py      surrogate-key strategies (test-scale + 100TB-scale)
  joins.py     lookup / normalized-string / interval (as-of) /
               null-safe / semi / anti / salted-skew join operators
  qa.py        the reference's QA suite as reusable DataFrame checks
  star.py      the 3-stage clinical pipeline (staging -> dwh -> agg)
  text.py      tokenize / shingle / MinHash / LSH / SimHash blocks
  similarity.py Arrow-batched numpy top-k + MLlib KMeans IVF buckets
  queries/     registered (query, oracle-SQL) pairs for the driver
  streaming.py Structured Streaming surface (watermark windows,
               session windows, stateful ops, streaming dedup)
  multimodal.py binary-column (image/audio) plumbing via mapInPandas
"""

__version__ = "0.1.0"
