"""One-command round certification: oracle contract -> pytest -> bench smoke.

The three gates run SEQUENTIALLY (each grabs every core; overlapping them
skews timings and starves the JVMs):

  1. ``scripts/verify_contract.py`` — every ``queries()`` entry vs its
     ``oracle_sql()`` in DuckDB at sf0.01 (the driver's correctness gate).
  2. ``python -m pytest tests/ -q`` — the unit/property/plan-shape suite.
  3. ``bench.py`` at sf0.01, one rep — smoke, not measurement: the bench
     must run end-to-end and emit its two-line JSON contract (full
     per-query detail line + a compact <2 KB final line with
     {metric, value, unit, queries, sf}) with no failed (-1) query.

A fourth gate (r13 verdict #4) proves the WHEEL end-to-end without a
Docker daemon: ``scripts/wheel_e2e.py --fast`` builds the wheel with the
stdlib builder, installs it into a fresh venv, and drives an oracle
subset + a pytest slice from a staging dir where the engine can only
resolve from the venv (assert-guarded). ``--wheel-full`` runs the FULL
catalog + suite from the venv instead (the round-certifying form, ~25
min — run at least once per round; scripts/artifacts_wheel_e2e.json
records the last run).

Exit 0 = round certified. Flags: ``--skip-bench`` / ``--skip-pytest`` /
``--skip-oracle`` / ``--skip-wheel`` to iterate on one gate;
``--wheel-full`` upgrades the wheel gate to the full profile.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_SF_DIR = os.environ.get("SPARK_GRAFT_CI_SF_DIR", "/root/testdata/sf0.01")


def run(step: str, cmd: list[str], env: dict | None = None, capture: bool = False):
    print(f"\n== {step}: {' '.join(cmd)}", flush=True)
    r = subprocess.run(
        cmd,
        cwd=ROOT,
        env={**os.environ, **(env or {})},
        capture_output=capture,
        text=True,
    )
    if r.returncode != 0:
        if capture:
            sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-2000:])
        print(f"== {step}: FAILED (exit {r.returncode})", flush=True)
        sys.exit(r.returncode)
    print(f"== {step}: OK", flush=True)
    return r


def main() -> None:
    args = set(sys.argv[1:])
    py = sys.executable
    if "--skip-install" not in args:
        # packaging smoke (r11 verdict #4): the engine must install as a
        # distribution, not a sys.path hack. This container lacks the
        # `wheel` package pip's editable path needs, so the smoke uses
        # the shimmed legacy editable (setup.py develop into a temp dir,
        # which writes an egg-link + .pth exactly like a user
        # site-packages install) and imports the package from a foreign
        # cwd through it.
        import tempfile

        dev_dir = tempfile.mkdtemp(prefix="cavde_ci_install_")
        run(
            "editable install",
            [py, "setup.py", "-q", "develop", "--install-dir", dev_dir],
            env={"PYTHONPATH": dev_dir},
        )
        smoke = (
            "import site, sys; site.addsitedir(sys.argv[1]); "
            "import cuda_acceleratedvectordatabaseengine_spark as p; "
            "from cuda_acceleratedvectordatabaseengine_spark.operators "
            "import ivf; "
            "print('install smoke ok:', p.__version__)"
        )
        r = subprocess.run(
            [py, "-c", smoke, dev_dir], cwd=tempfile.gettempdir(),
            text=True, capture_output=True,
        )
        if r.returncode != 0 or "install smoke ok" not in r.stdout:
            sys.stderr.write(r.stdout + "\n" + r.stderr)
            print("== install smoke: FAILED", flush=True)
            sys.exit(1)
        print("== install smoke: OK", flush=True)
    if "--skip-wheel" not in args:
        profile = [] if "--wheel-full" in args else ["--fast"]
        run("wheel e2e", [py, "scripts/wheel_e2e.py", *profile])
    if "--skip-oracle" not in args:
        run("oracle contract", [py, "scripts/verify_contract.py"])
    if "--skip-pytest" not in args:
        run("pytest", [py, "-m", "pytest", "tests/", "-q"])
    if "--skip-bench" not in args:
        r = run(
            "bench smoke",
            [py, "bench.py"],
            env={"SPARK_GRAFT_SF_DIR": BENCH_SF_DIR},
            capture=True,
        )
        lines = r.stdout.strip().splitlines()
        line = lines[-1]
        # the driver's tail capture holds ~3 KB and parses the LAST line —
        # certify it stays compact (bench.py asserts <2048 as well)
        assert len(line) < 2048, f"final bench line too long ({len(line)})"
        out = json.loads(line)
        missing = {"metric", "value", "unit", "queries", "sf"} - out.keys()
        assert not missing, f"bench JSON missing fields: {missing}"
        assert out["queries"], "bench JSON has no per-query timings"
        # the FULL per-query dict lives on its own earlier stdout line
        detail = next(
            (
                json.loads(ln)
                for ln in lines
                if ln.startswith('{"detail":"per_query_sec"')
            ),
            None,
        )
        assert detail is not None, "bench detail line missing"
        failed = [q for q, t in detail["queries"].items() if t < 0]
        assert not failed, f"bench queries failed: {failed}"
        assert out["value"] >= 0 and out["unit"] == "sec"
        print(f"bench contract OK: {len(detail['queries'])} queries, "
              f"total {out['value']}s at sf={out['sf']}")
    print("\nround certified: all gates green")


if __name__ == "__main__":
    main()
