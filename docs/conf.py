# Sphinx configuration for pmesh_tpu.
import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "pmesh_tpu"
author = "pmesh_tpu developers"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.mathjax",
    "sphinx.ext.viewcode",
]

autodoc_mock_imports = ["jax", "jaxlib", "orbax"]
master_doc = "index"
html_theme = "alabaster"
exclude_patterns = ["_build"]
