"""kafka_stream_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
the reference stack (FireMonkey69/kafka-stream, a packaging of the Landoop
kafka-lenses-dev box: Kafka + Connect/KCQL + Lenses streaming SQL; see
SURVEY.md), re-expressed Spark-first:

- batch + streaming DataFrames over keyed, partitioned datasets ("topics")
- a versioned, compatibility-checked schema catalog (Schema Registry analog)
- declarative pipeline specs and a KCQL-subset parser (Connect analog)
- streaming SQL via Catalyst (Lenses analog)
- large-scale training-data operators: dedup (exact/MinHash/SimHash/Jaccard),
  similarity search, text analysis, multimodal column plumbing

Everything is built on the public PySpark DataFrame/SQL/Structured-Streaming
API; Catalyst + Tungsten do the physical work.
"""

__version__ = "0.1.0"

from kafka_stream_spark.session import get_spark  # noqa: F401
from kafka_stream_spark.catalog import Catalog, load_tables  # noqa: F401
from kafka_stream_spark.engine import Engine  # noqa: F401
