"""Compatibility shim: all metadata lives in pyproject.toml (PEP 621).

Kept so `python setup.py develop` works on old setuptools without the
`wheel` package (PEP 660 editable installs build a wheel; containers
without `wheel` can still get a live install this way).
"""

from setuptools import setup

setup()
