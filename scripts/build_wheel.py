"""Build the engine's wheel with the stdlib only (r13 verdict #4).

This container's setuptools (65.x) predates vendored bdist_wheel and the
`wheel` package is absent, so `pip wheel .` cannot run here. A wheel is
just a zip laid out per PEP 427 + a `*.dist-info/{METADATA,WHEEL,RECORD}`
— buildable deterministically from pyproject.toml with zipfile/hashlib.
The output installs with plain `pip install` anywhere (pip validates
RECORD hashes on install, so a malformed build fails loud, not silent).

    python scripts/build_wheel.py [out_dir]      # default dist/

Prints the wheel path. Consumed by scripts/wheel_e2e.py (the daemonless
stand-in for `docker build` + in-image smoke).
"""
from __future__ import annotations

import base64
import hashlib
import os
import sys
import tomllib
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _record_hash(data: bytes) -> str:
    digest = hashlib.sha256(data).digest()
    return "sha256=" + base64.urlsafe_b64encode(digest).rstrip(b"=").decode()


def build(out_dir: str) -> str:
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)["project"]
    name, version = meta["name"], meta["version"]
    dist = name.replace("-", "_")
    tag = "py3-none-any"
    wheel_name = f"{dist}-{version}-{tag}.whl"
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, wheel_name)

    metadata = [
        "Metadata-Version: 2.1",
        f"Name: {name}",
        f"Version: {version}",
        f"Summary: {meta['description']}",
        f"Requires-Python: {meta['requires-python']}",
        "License: Apache-2.0",
    ]
    metadata += [f"Requires-Dist: {d}" for d in meta["dependencies"]]
    for extra, deps in meta.get("optional-dependencies", {}).items():
        metadata.append(f"Provides-Extra: {extra}")
        metadata += [
            f'Requires-Dist: {d}; extra == "{extra}"' for d in deps
        ]
    wheel_meta = [
        "Wheel-Version: 1.0",
        "Generator: scripts/build_wheel.py (stdlib)",
        "Root-Is-Purelib: true",
        f"Tag: {tag}",
    ]

    # package payload: exactly the packages pyproject declares — no
    # tests, scripts, or artifacts ride into user site-packages
    packages = tomllib.load(open(os.path.join(ROOT, "pyproject.toml"), "rb"))[
        "tool"
    ]["setuptools"]["packages"]
    files: list[tuple[str, bytes]] = []
    for pkg in packages:
        pkg_dir = os.path.join(ROOT, pkg.replace(".", os.sep))
        for fn in sorted(os.listdir(pkg_dir)):
            if fn.endswith(".py"):
                arc = pkg.replace(".", "/") + "/" + fn
                with open(os.path.join(pkg_dir, fn), "rb") as f:
                    files.append((arc, f.read()))
    info = f"{dist}-{version}.dist-info"
    files.append((f"{info}/METADATA", ("\n".join(metadata) + "\n").encode()))
    files.append((f"{info}/WHEEL", ("\n".join(wheel_meta) + "\n").encode()))

    record_rows = [
        f"{arc},{_record_hash(data)},{len(data)}" for arc, data in files
    ]
    record_rows.append(f"{info}/RECORD,,")
    record = ("\n".join(record_rows) + "\n").encode()

    # fixed timestamps => byte-identical wheel for identical sources
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for arc, data in files + [(f"{info}/RECORD", record)]:
            zi = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
            zi.external_attr = 0o644 << 16
            z.writestr(zi, data)
    return path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "dist")
    print(build(out))
