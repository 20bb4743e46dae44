"""Explicit StructTypes for every table the engine touches.

Mirrors the reference's fixed-schema model (dimension + metric are checked
per request, server/query_service.cpp:115-119; the wire schema is
``{id: uint64, vector: repeated float}``, proto/vdb.proto:10-13). Spark has
no unsigned 64-bit integer, so ids are LongType with the documented
restriction id < 2^63 — the reference's own Arrow files use uint64 but its
tests never exceed small positive ids (test/simple_test.cpp:119-138).

Schemas are always passed explicitly (never inferred) so a malformed source
fails at plan time, not mid-job on executor 731 of 1000.
"""

from __future__ import annotations

from pyspark.sql import types as T

# {id, vector}: the indexed corpus (format/storage.cpp:287-292)
VECTORS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("vector", T.ArrayType(T.FloatType(), containsNull=False), False),
    ]
)

# {query_id, qvec}: a search batch (proto/vdb.proto:16-23)
QUERIES = T.StructType(
    [
        T.StructField("query_id", T.LongType(), False),
        T.StructField("qvec", T.ArrayType(T.FloatType(), containsNull=False), False),
    ]
)

# k-means / coarse-quantizer output (engine/ivf_flat_index.cpp:21-22)
CENTROIDS = T.StructType(
    [
        T.StructField("list_id", T.IntegerType(), False),
        T.StructField("centroid", T.ArrayType(T.DoubleType(), containsNull=False), False),
    ]
)

# search results: ascending distance, dedup by id (proto/vdb.proto:25-38,
# merge semantics engine/ivf_flat_index.cpp:474-518)
RESULTS = T.StructType(
    [
        T.StructField("query_id", T.LongType(), False),
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("id", T.LongType(), False),
        T.StructField("distance", T.DoubleType(), False),
    ]
)

# PQ codebooks: m subspaces x ks codewords of dimension dsub
# (engine/kernels.cuh:189-196; storage id packing format/storage.cpp:255-271)
CODEBOOKS = T.StructType(
    [
        T.StructField("subspace", T.IntegerType(), False),
        T.StructField("code", T.IntegerType(), False),
        T.StructField("centroid", T.ArrayType(T.DoubleType(), containsNull=False), False),
    ]
)

# PQ-encoded vectors: codes is m uint8 codewords, stored compactly as binary
# (the reference stores uint8[m] per vector, engine/kernels.cuh:226-237)
PQ_CODES = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("list_id", T.IntegerType(), False),
        T.StructField("codes", T.BinaryType(), False),
    ]
)

# Assigned corpus rows inside an epoch (engine/ivf_flat_index.h:24-36)
INDEXED_VECTORS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("vector", T.ArrayType(T.FloatType(), containsNull=False), False),
        T.StructField("list_id", T.IntegerType(), False),
    ]
)

# Driver testdata schemas (FIXTURES.md §2), declared so reads never infer.
TESTDATA = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}
