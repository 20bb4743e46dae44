"""Shared 768-d virtual-corpus generator for the high-dimension probes
(scale_probe_768d.py, ab_packed_768d.py).

Design and the three measured dead ends (uniform 768-d, center+noise,
non-virtual corpora) are documented in scale_probe_768d.py's module
docstring and PERF.md r10. Probe-harness code — the engine's data path
stays row-UDF-free.
"""
import numpy as np
import pyarrow as pa
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

DIM = 768
INTRINSIC = 64  # latent dimension; matches every prior scale probe
_Z_OFFSET = np.uint64(1) << np.uint64(32)  # latent-draw hash stream
_P_OFFSET = np.uint64(1) << np.uint64(33)  # projection-matrix hash stream

VEC_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("vector", ArrayType(FloatType(), False), False),
    ]
)


def _splitmix_unit(keys: np.ndarray, dim: int) -> np.ndarray:
    """(len(keys), dim) float32 in [-1, 1): SplitMix64 of key*dim+j.

    Pure uint64 numpy (wrapping multiplies are modular by construction),
    so outputs are a deterministic function of the key — regenerating a
    partition always yields identical bytes, which is what lets the
    corpus stay virtual across the train/assign/ground-truth scans.
    """
    x = (keys.astype(np.uint64)[:, None] * np.uint64(dim)) + np.arange(
        dim, dtype=np.uint64
    )[None, :]
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    # top 24 bits -> [0, 2^24) -> [-1, 1)
    return ((z >> np.uint64(40)).astype(np.float32) / np.float32(2**23)) - np.float32(
        1.0
    )


def splitmix_vectors(ids: np.ndarray, dim: int = DIM) -> np.ndarray:
    """Embedding-like vectors: 64-d uniform latent draws projected into
    the 768-d ambient space by a fixed hash-derived matrix — real
    embeddings' own low-intrinsic-dimension shape (see PERF.md r10 for
    the two measured synthetic-corpus dead ends this replaces).
    """
    ids = ids.astype(np.uint64)
    proj = _splitmix_unit(
        np.arange(INTRINSIC, dtype=np.uint64) + _P_OFFSET, dim
    ) / np.float32(np.sqrt(INTRINSIC))
    z = _splitmix_unit(ids + _Z_OFFSET, INTRINSIC)
    return z @ proj


def synth_corpus(spark, n: int, dim: int = DIM, parts: int = 256):
    """Virtual n x dim corpus: mapInArrow over spark.range."""

    def gen(batches):
        for batch in batches:
            ids = batch.column("id").to_numpy()
            for lo in range(0, len(ids), 4096):
                chunk = ids[lo : lo + 4096]
                vecs = splitmix_vectors(chunk, dim)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(chunk, type=pa.int64()),
                        pa.FixedSizeListArray.from_arrays(
                            pa.array(vecs.ravel(), type=pa.float32()), dim
                        ).cast(pa.list_(pa.float32())),
                    ],
                    names=["id", "vector"],
                )

    return spark.range(0, n, 1, parts).mapInArrow(gen, VEC_SCHEMA)
