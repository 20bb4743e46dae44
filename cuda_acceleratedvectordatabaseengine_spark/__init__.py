"""PySpark-native analytics engine with the query and data-processing
capabilities of wedevxer/CUDA-AcceleratedVectorDatabaseEngine.

The reference is a single-node GPU IVF-Flat vector database (see
/root/repo/SURVEY.md). This package re-expresses its full capability set —
vector tables, k-means index build, IVF/PQ top-k similarity search with
L2 / inner-product / cosine metrics, epoch-versioned index lifecycle,
recall/stats evaluation — as idiomatic Spark: DataFrame/SQL plans that
Catalyst optimizes, Arrow-batched pandas UDFs for the dense numeric hot
path, and Structured Streaming for micro-batched query serving. It is
extended with the LLM-data-pipeline operators a 100 TB training-data
pipeline needs (dedup families, text analysis, ANN similarity search,
multimodal column plumbing).

No code is ported from the reference; file:line citations in docstrings
point at the behavior being matched.
"""

__version__ = "0.1.0"
