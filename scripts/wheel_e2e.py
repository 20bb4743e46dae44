"""Fresh-venv wheel e2e — the daemonless stand-in for `docker build` +
in-image smoke (r13 verdict #4: the Dockerfile is structurally validated
but no daemon exists here to build it; this proves the same property the
image build would — the engine runs END-TO-END from its packaged wheel,
not from the repo checkout).

Steps:
  1. build the wheel with scripts/build_wheel.py (stdlib-only builder);
  2. create a FRESH venv and `pip install --no-index --no-deps` the
     wheel into it. The venv uses --system-site-packages for the runtime
     deps (pyspark/numpy/pyarrow/pandas/duckdb/pytest) because this
     container is offline — the same role the Docker base image plays.
     The clean-room property proven is that the ENGINE code resolves
     exclusively from the installed wheel: the gates run from a staging
     dir that contains tests/ and the entry contract but NO package dir,
     and each gate asserts the module's __file__ is inside the venv;
  3. stage {tests/, scripts/verify_contract.py, scripts/verify_subset.py,
     __spark_entry__.py} into a temp dir and run there with the venv
     python:
       - import smoke (module resolves from the venv, version matches),
       - oracle contract  (full catalog, or verify_subset with --fast),
       - pytest           (full suite, or a marker subset with --fast).

    python scripts/wheel_e2e.py          # full: the round-certifying run
    python scripts/wheel_e2e.py --fast   # ci.py's default bounded profile

Exit 0 = the wheel serves the whole contract. Writes
scripts/artifacts_wheel_e2e.json with per-gate walls.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import venv

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "cuda_acceleratedvectordatabaseengine_spark"

# the bounded --fast pytest slice: one suite per engine layer, heavy
# index/pipeline suites excluded (the full run covers them)
FAST_TESTS = [
    "tests/test_distance.py",
    "tests/test_knn.py",
    "tests/test_util.py",
    "tests/test_chaos_writes.py",
    "tests/test_deploy_surface.py",
]


def main() -> int:
    fast = "--fast" in sys.argv[1:]
    walls: dict[str, float] = {}
    work = tempfile.mkdtemp(prefix="cavde_wheel_e2e_")
    try:
        t0 = time.perf_counter()
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, "scripts", "build_wheel.py"),
             os.path.join(work, "dist")],
            capture_output=True, text=True, check=True,
        )
        wheel = out.stdout.strip().splitlines()[-1]
        walls["build_wheel"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        env_dir = os.path.join(work, "venv")
        venv.EnvBuilder(
            system_site_packages=True, with_pip=True
        ).create(env_dir)
        vpy = os.path.join(env_dir, "bin", "python")
        subprocess.run(
            [vpy, "-m", "pip", "install", "-q", "--no-index", "--no-deps",
             wheel],
            check=True,
        )
        walls["venv_install"] = round(time.perf_counter() - t0, 2)

        # stage: everything the gates need EXCEPT the package itself
        stage = os.path.join(work, "stage")
        os.makedirs(os.path.join(stage, "scripts"))
        shutil.copytree(os.path.join(ROOT, "tests"),
                        os.path.join(stage, "tests"))
        for rel in ("scripts/verify_contract.py", "scripts/verify_subset.py",
                    "__spark_entry__.py"):
            shutil.copy(os.path.join(ROOT, rel), os.path.join(stage, rel))
        genv = {
            **os.environ,
            "PYSPARK_PYTHON": vpy,
            "PYSPARK_DRIVER_PYTHON": vpy,
            # deploy-surface tests validate REPO artifacts (Dockerfile,
            # deploy/); point them at the checkout — engine imports still
            # resolve from the wheel (no package dir in the stage)
            "CAVDE_REPO_ROOT": ROOT,
        }

        def gate(name: str, cmd: list[str]) -> None:
            print(f"\n== wheel-e2e {name}: {' '.join(cmd)}", flush=True)
            g0 = time.perf_counter()
            r = subprocess.run(cmd, cwd=stage, env=genv, text=True,
                               capture_output=True)
            walls[name] = round(time.perf_counter() - g0, 2)
            if r.returncode != 0:
                sys.stderr.write(r.stdout[-3000:] + "\n" + r.stderr[-3000:])
                print(f"== wheel-e2e {name}: FAILED", flush=True)
                raise SystemExit(r.returncode)
            print(f"== wheel-e2e {name}: OK ({walls[name]}s)", flush=True)

        gate("import_smoke", [
            vpy, "-c",
            f"import {PKG} as p; import os;"
            f"assert os.path.realpath(p.__file__).startswith("
            f"os.path.realpath({env_dir!r})), p.__file__;"
            f"assert p.__version__;"
            f"from {PKG}.operators import ivf, dedup, pq;"
            f"from {PKG}.service import VectorEngine;"
            f"print('wheel import OK:', p.__file__)",
        ])
        # the oracle gate asserts the same venv-resolution invariant
        # inside the Spark-driving process itself
        guard = (
            f"import {PKG} as p, os;"
            f"assert os.path.realpath(p.__file__).startswith("
            f"os.path.realpath({env_dir!r})), 'repo leak: ' + p.__file__;"
        )
        if fast:
            # one representative spec per engine family
            subset = [
                "q1_scan_filter", "q2_knn_l2", "ivf_search_combo",
                "pq_recall_rerank", "dedup_stats_combo",
                "corpus_filter_combo", "text_bpe_pair_counts",
                "metrics_report_combo",
            ]
            gate("oracle_subset", [
                vpy, "-c", guard + "import runpy, sys;"
                f"sys.argv=['verify_subset.py', *{subset!r}];"
                "runpy.run_path('scripts/verify_subset.py', "
                "run_name='__main__')",
            ])
            gate("pytest_subset",
                 [vpy, "-m", "pytest", *FAST_TESTS, "-q", "--no-header"])
        else:
            gate("oracle_full", [
                vpy, "-c", guard + "import runpy, sys;"
                "sys.argv=['verify_contract.py'];"
                "runpy.run_path('scripts/verify_contract.py', "
                "run_name='__main__')",
            ])
            gate("pytest_full",
                 [vpy, "-m", "pytest", "tests/", "-q", "--no-header"])

        walls["profile"] = "fast" if fast else "full"
        art = os.path.join(ROOT, "scripts", "artifacts_wheel_e2e.json")
        with open(art, "w") as f:
            json.dump(walls, f, indent=1)
        print(f"\nwheel e2e green ({walls['profile']}): {walls}")
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
