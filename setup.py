"""Setuptools shim: enables legacy editable installs (`pip install -e .`)
on toolchains without the `wheel` package (PEP 660 metadata generation
needs bdist_wheel on setuptools < 70). All metadata lives in
pyproject.toml."""

from setuptools import setup

setup()
