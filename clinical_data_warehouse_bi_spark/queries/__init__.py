"""Query modules — importing this package registers every query."""

from clinical_data_warehouse_bi_spark.queries import (  # noqa: F401
    core,
    dedup,
    hygiene,
    join_ops,
    qa_report,
    retrieval_ops,
    similarity,
    text_ops,
    windows,
)
