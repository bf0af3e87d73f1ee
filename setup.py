"""Setup shim — metadata lives in pyproject.toml (setuptools>=61 reads
it).  Kept for parity with the reference's setup.py-based packaging
(/root/reference/setup.py) and for environments whose pip cannot do
PEP 660 editable installs (no `wheel` available): there,
``python setup.py develop`` / ``pip install -e . --no-use-pep517``
still work through this file."""

from setuptools import setup

setup()
