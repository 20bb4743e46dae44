"""Shim for legacy editable installs (`pip install -e .`) on
environments whose setuptools predates PEP 660 wheel-less editables —
all metadata lives in pyproject.toml (PEP 621)."""

from setuptools import setup

setup()
