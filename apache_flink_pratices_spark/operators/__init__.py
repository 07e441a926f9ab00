"""Operator inventory (SURVEY.md §2). Importing this package registers every
query in :mod:`apache_flink_pratices_spark.registry`."""

from apache_flink_pratices_spark.operators import (  # noqa: F401
    curation,
    dedup,
    fraud,
    graph,
    kmeans,
    market_pipeline,
    multimodal,
    olap,
    orderbook,
    pca,
    protobuf_codec,
    quantization,
    relational,
    row_transforms,
    search_index,
    similarity,
    skew,
    streaming_golden,
    subqueries,
    temporal,
    text,
    windows,
)

# K2/K3 wire-projection queries register from the sink module itself
from apache_flink_pratices_spark.sinks import kafka as _kafka_sink  # noqa: F401
