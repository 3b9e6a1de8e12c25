"""PySpark-native entity-resolution / record-linkage engine.

A brand-new DataFrame-first rebuild of the capability set of
``yalelibrary-metadata-services/entity-resolution-pipeline-v1``
(read-only reference at /root/reference):

    preprocess -> block -> pair -> score -> classify -> cluster

re-expressed on idiomatic PySpark: declarative DataFrame plans for
Catalyst, Arrow-vectorized pandas UDFs where Python is genuinely
needed (embedding cosine, Jaro-Winkler, HTML text extraction),
explicit partitioning / salting / AQE for skew, and iterative
large-star/small-star connected components for transitive clustering.

Nothing here is a port: the reference is single-machine Python with
Weaviate ANN + joblib; this engine replaces ANN blocking with
MinHash-LSH + sorted-neighborhood keys and per-record loops with
whole-stage-codegen column expressions.
"""

__version__ = "0.1.0"

from . import config, session  # noqa: F401
