"""Example cluster build job — the mainApplicationFile the deploy
recipes submit (deploy/spark-submit.md §2-3, k8s-spark-application.yaml).

Parameterized by environment so the same image serves every index:
  CAVDE_DATA_PATH   index root (e.g. s3a://bucket/indexes)  [required]
  CAVDE_SOURCE      parquet/arrow source of {id, vector}    [required]
  CAVDE_INDEX       index name                 (default "docs")
  CAVDE_ID_COL      id column in the source    (default "id")
  CAVDE_VEC_COL     vector column in the source (default "vector")
  CAVDE_DIM         vector dimension           (default probed from source)
  CAVDE_METRIC      l2 | ip | cosine           (default l2)
  CAVDE_NLIST       coarse lists               (default suggest_params)
  CAVDE_RECALL      recall_target, e.g. 0.9    (default: no contract)
  CAVDE_STORAGE     warm | cold                (default unset)
  CAVDE_PQ_M        PQ subspaces (0 = flat)    (default 0)
  CAVDE_ACTIVATE    1 = activate the epoch     (default 1)
"""
import os

from pyspark.sql import SparkSession

from cuda_acceleratedvectordatabaseengine_spark.service import VectorEngine


def main() -> None:
    spark = SparkSession.builder.getOrCreate()
    data_path = os.environ["CAVDE_DATA_PATH"]
    source = os.environ["CAVDE_SOURCE"]
    name = os.environ.get("CAVDE_INDEX", "docs")
    eng = VectorEngine(spark, data_path)

    id_col = os.environ.get("CAVDE_ID_COL", "id")
    vec_col = os.environ.get("CAVDE_VEC_COL", "vector")

    # probe through the engine's own source detector so Arrow-IPC
    # sources (which build_epoch accepts) work here too; each probe is
    # an extra source job, so set CAVDE_DIM/CAVDE_NLIST to skip them
    dim = int(os.environ.get("CAVDE_DIM", "0"))
    if not dim:
        rows = eng._read_source(source).select(vec_col).head(1)
        if not rows:
            raise ValueError(
                f"CAVDE_SOURCE {source!r} is empty — cannot probe the "
                f"vector dimension; set CAVDE_DIM explicitly or point at "
                f"a non-empty source"
            )
        dim = len(rows[0][0])
    nlist = int(os.environ.get("CAVDE_NLIST", "0"))
    if not nlist:
        n = eng._read_source(source).count()
        nlist = eng.suggest_params(n)["nlist"]
    recall = os.environ.get("CAVDE_RECALL")

    try:
        eng.create_index(
            name,
            dimension=dim,
            metric=os.environ.get("CAVDE_METRIC", "l2"),
            nlist=nlist,
            m=int(os.environ.get("CAVDE_PQ_M", "0")),
            recall_target=float(recall) if recall else None,
            storage=os.environ.get("CAVDE_STORAGE") or None,
        )
    except ValueError as e:
        if "already exists" not in str(e):
            raise  # re-runs build a new epoch on the existing index
    epoch = eng.build_epoch(
        name,
        source,
        id_col=id_col,
        vec_col=vec_col,
        activate=os.environ.get("CAVDE_ACTIVATE", "1") == "1",
    )
    print(f"built epoch {epoch} for index {name!r}: {eng.get_stats(name)}")


if __name__ == "__main__":
    main()
