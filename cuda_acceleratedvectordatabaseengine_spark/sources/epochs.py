"""Epoch-versioned immutable index storage (F4/F5, SURVEY.md §2.4).

Reference semantics matched (format/storage.cpp:318-579):
- an index build produces an IMMUTABLE, versioned epoch directory;
- exactly one epoch is active at a time; activation is an atomic pointer
  swap (zero-downtime, storage.cpp:351-375) — here a tmp-file + rename of
  an ``_ACTIVE`` pointer file;
- garbage collection keeps the newest 3 epochs (storage.cpp:430-434) and
  never deletes the active one;
- a JSON manifest per epoch records index params + shard list + created_at
  (format/storage.cpp:22-132).

Layout (parquet partitioning gives the per-list "shards" of
format/storage.h:124-173 for free):

    {base_dir}/{index_name}/
        _ACTIVE                      # contains the active epoch id
        epoch=1/
            manifest.json
            centroids.parquet        # {list_id, centroid[]}
            vectors/                 # parquet partitioned by list_id
                list_id=0/...parquet
        epoch=2/...

At 100 TB the base_dir is an object-store prefix; the pointer-file pattern,
partitioned layout, and manifest survive unchanged (rename-on-write becomes
a conditional put).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KEEP_EPOCHS = 3  # format/storage.cpp:430-434
ACTIVE_FILE = "_ACTIVE"


def _murmur3_int32(x: int, seed: int = 42) -> int:
    """Murmur3_x86_32 of a single 4-byte int block — bit-for-bit what Spark's
    ``Murmur3Hash`` (and ``F.hash``) computes for an IntegerType column, and
    therefore what ``HashPartitioning`` uses to place rows. Pinned against
    ``F.hash`` by tests/test_ivf.py so a Spark-side change can't silently
    diverge."""
    M = 0xFFFFFFFF
    k = (x & M) * 0xCC9E2D51 & M
    k = ((k << 15) | (k >> 17)) & M
    k = k * 0x1B873593 & M
    h = (seed ^ k) & M
    h = ((h << 13) | (h >> 19)) & M
    h = (h * 5 + 0xE6546B64) & M
    h ^= 4  # total byte length
    h ^= h >> 16
    h = h * 0x85EBCA6B & M
    h ^= h >> 13
    h = h * 0xC2B2AE35 & M
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h  # signed int32


def partition_tokens(nlist: int, search_factor: int = 256) -> list[int] | None:
    """For every shuffle slot ``l`` in [0, nlist), an int token ``t`` with
    ``pmod(murmur3(t), nlist) == l``.

    ``repartition(nlist, "list_id")`` hash-places the nlist distinct keys
    into nlist partitions — balls-in-bins, so ~1/e of the write tasks sit
    idle while the unluckiest one carries 3-4 inverted lists (a measured
    2-4x straggler on the epoch-write critical path). Routing the shuffle
    on ``token[list_id]`` instead puts EACH LIST IN ITS OWN TASK exactly.
    Token search is driver-side arithmetic (coupon-collector, ~nlist·ln
    nlist hashes); returns None if coverage fails so the caller can fall
    back to plain hash partitioning."""
    tokens: list[int | None] = [None] * nlist
    found = 0
    for t in range(search_factor * nlist):
        slot = _murmur3_int32(t) % nlist  # == Spark Pmod for positive nlist
        if tokens[slot] is None:
            tokens[slot] = t
            found += 1
            if found == nlist:
                return tokens  # type: ignore[return-value]
    return None


@dataclass
class Manifest:
    """Mirrors format/storage.h:15-42 (IndexManifest)."""

    index_name: str
    epoch: int
    dimension: int
    metric: str
    nlist: int
    num_vectors: int
    created_at_ns: int
    pq: dict[str, Any] | None = None  # {"m": int, "nbits": int} when PQ-encoded
    extra: dict[str, Any] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(self.__dict__, indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Manifest":
        return cls(**json.loads(s))


class EpochManager:
    def __init__(self, base_dir: str, index_name: str):
        self.base_dir = base_dir
        self.index_name = index_name
        self.index_dir = os.path.join(base_dir, index_name)

    # -- paths ------------------------------------------------------------
    def epoch_dir(self, epoch: int) -> str:
        return os.path.join(self.index_dir, f"epoch={epoch}")

    def manifest_path(self, epoch: int) -> str:
        return os.path.join(self.epoch_dir(epoch), "manifest.json")

    def vectors_path(self, epoch: int) -> str:
        return os.path.join(self.epoch_dir(epoch), "vectors")

    def centroids_path(self, epoch: int) -> str:
        return os.path.join(self.epoch_dir(epoch), "centroids.parquet")

    def codes_path(self, epoch: int) -> str:
        return os.path.join(self.epoch_dir(epoch), "pq_codes")

    def codebooks_path(self, epoch: int) -> str:
        return os.path.join(self.epoch_dir(epoch), "codebooks.parquet")

    # -- lifecycle (F5) ----------------------------------------------------
    def list_epochs(self) -> list[int]:
        if not os.path.isdir(self.index_dir):
            return []
        out = []
        for name in os.listdir(self.index_dir):
            if name.startswith("epoch="):
                try:
                    out.append(int(name.split("=", 1)[1]))
                except ValueError:
                    continue
        return sorted(out)

    def next_epoch(self) -> int:
        epochs = self.list_epochs()
        return (epochs[-1] + 1) if epochs else 1

    def active_epoch(self) -> int | None:
        p = os.path.join(self.index_dir, ACTIVE_FILE)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def activate(self, epoch: int) -> None:
        """Atomic pointer swap — single-active invariant
        (format/storage.cpp:351-375)."""
        if epoch not in self.list_epochs():
            raise ValueError(f"epoch {epoch} does not exist for {self.index_name}")
        p = os.path.join(self.index_dir, ACTIVE_FILE)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(epoch))
        os.replace(tmp, p)

    def deactivate(self) -> None:
        p = os.path.join(self.index_dir, ACTIVE_FILE)
        if os.path.exists(p):
            os.remove(p)

    def cleanup(self, keep: int = KEEP_EPOCHS) -> list[int]:
        """Delete all but the newest ``keep`` epochs; the active epoch is
        always retained (format/storage.cpp:430-462)."""
        epochs = self.list_epochs()
        active = self.active_epoch()
        doomed = [e for e in epochs[:-keep] if e != active] if len(epochs) > keep else []
        for e in doomed:
            shutil.rmtree(self.epoch_dir(e), ignore_errors=True)
        return doomed

    # -- write (F1/F4) -----------------------------------------------------
    def write_epoch(
        self,
        assigned: DataFrame,
        centroids: np.ndarray,
        metric: str,
        activate: bool = True,
        pq: dict[str, Any] | None = None,
    ) -> tuple[int, Manifest]:
        """Persist an assigned corpus {id, vector, list_id} as a new epoch.

        ``partitionBy("list_id")`` is the inverted-list layout: a later
        search with nprobe lists becomes a parquet PARTITION-PRUNED scan —
        the Spark-native form of the reference's probe-only-nprobe-lists
        optimization (ivf_flat_index.cpp:218-221)."""
        epoch = self.next_epoch()
        os.makedirs(self.epoch_dir(epoch), exist_ok=True)
        # repartition on the partition column first: without it every task
        # writes a sliver of every list (tasks x nlist small files — a
        # metadata storm at 1000 executors); with it each list is one
        # contiguous file chain, which is also what makes the later
        # nprobe partition-pruned scan cheap. The shuffle is routed on a
        # per-list TOKEN column chosen so murmur3 places every list in its
        # own partition (see partition_tokens) — plain hashing of nlist keys
        # into nlist slots leaves ~1/e of the write tasks empty and piles
        # 3-4 lists on the unluckiest (measured 2-4x straggler at
        # nlist=128/sf0.1); exact routing makes the write wave flat.
        nlist = int(np.asarray(centroids).shape[0])
        tokens = partition_tokens(nlist)
        if tokens is not None:
            routed = assigned.withColumn(
                "__slot",
                F.element_at(
                    F.array(*[F.lit(int(t)) for t in tokens]), F.col("list_id") + 1
                ),
            )
            shuffled = routed.repartition(nlist, "__slot").drop("__slot")
        else:
            shuffled = assigned.repartition(nlist, "list_id")
        shuffled.write.mode("errorifexists").partitionBy("list_id").parquet(
            self.vectors_path(epoch)
        )
        # centroids are an O(nlist*d) driver-side artifact — write directly
        # with pyarrow (a Spark job for a handful of rows costs seconds of
        # scheduling); spark.read.parquet reads the single file unchanged
        import pyarrow as pa
        import pyarrow.parquet as papq

        C = np.asarray(centroids, dtype=np.float64)
        offsets = np.arange(C.shape[0] + 1, dtype=np.int32) * C.shape[1]
        papq.write_table(
            pa.table(
                {
                    "list_id": pa.array(
                        np.arange(C.shape[0], dtype=np.int32), pa.int32()
                    ),
                    "centroid": pa.ListArray.from_arrays(
                        pa.array(offsets), pa.array(C.reshape(-1))
                    ),
                }
            ),
            self.centroids_path(epoch),
        )
        # row count from parquet footers (pure metadata, no data scan —
        # the write itself was the only full pass over the corpus)
        num_vectors = 0
        for root, _dirs, files in os.walk(self.vectors_path(epoch)):
            for fn in files:
                if fn.endswith(".parquet"):
                    num_vectors += papq.ParquetFile(
                        os.path.join(root, fn)
                    ).metadata.num_rows
        manifest = Manifest(
            index_name=self.index_name,
            epoch=epoch,
            dimension=int(centroids.shape[1]),
            metric=metric,
            nlist=int(centroids.shape[0]),
            num_vectors=int(num_vectors),
            created_at_ns=time.time_ns(),
            pq=pq,
        )
        with open(self.manifest_path(epoch), "w") as f:
            f.write(manifest.to_json())
        if activate:
            self.activate(epoch)
        return epoch, manifest

    # -- read --------------------------------------------------------------
    def resolve_epoch(self, epoch: int | None = None) -> int:
        if epoch is not None:
            return epoch
        active = self.active_epoch()
        if active is None:
            raise ValueError(f"no active epoch for index {self.index_name}")
        return active

    def read_manifest(self, epoch: int | None = None) -> Manifest:
        with open(self.manifest_path(self.resolve_epoch(epoch))) as f:
            return Manifest.from_json(f.read())

    def read_vectors(self, spark: SparkSession, epoch: int | None = None) -> DataFrame:
        return spark.read.parquet(self.vectors_path(self.resolve_epoch(epoch)))

    def read_centroids(self, spark: SparkSession, epoch: int | None = None) -> np.ndarray:
        rows = (
            spark.read.parquet(self.centroids_path(self.resolve_epoch(epoch)))
            .orderBy("list_id")
            .collect()
        )
        return np.asarray([r["centroid"] for r in rows], dtype=np.float64)
