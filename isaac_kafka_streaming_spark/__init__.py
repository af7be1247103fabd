"""isaac_kafka_streaming_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference Kafka Streams application `dunderwood88/isaac-kafka-streaming`
(surveyed in /root/repo/SURVEY.md), re-expressed Spark-first:

- every operator is a pure DataFrame -> DataFrame function (batch), built
  from pyspark.sql built-ins so Catalyst/Tungsten own the physical plan;
- streaming forms are thin Structured-Streaming wrappers over the same
  transformations (see `streaming/`);
- north-star LLM-data-pipeline extensions (dedup, similarity search,
  text analysis, multimodal plumbing) live in `extensions/`.
"""

__version__ = "0.1.0"
