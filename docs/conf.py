# Sphinx configuration — counterpart of /root/reference/docs/conf.py:17-22
# (autodoc + napoleon + typehints over the package, RTD theme).
import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "projected_lmc_tpu"
copyright = "2026, projected_lmc_tpu authors"
author = "projected_lmc_tpu authors"
release = "0.2.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
]

autodoc_member_order = "bysource"
autodoc_mock_imports = ["torch"]
napoleon_google_docstring = True
napoleon_numpy_docstring = True

templates_path = ["_templates"]
exclude_patterns = ["_build", "Thumbs.db", ".DS_Store"]

try:
    import sphinx_rtd_theme  # noqa: F401
    html_theme = "sphinx_rtd_theme"
except ImportError:
    html_theme = "alabaster"
html_static_path = []
