"""Make ``petal_decomposition_tpu`` importable when the benchmark
scripts run from a source checkout without an installed package.

Every script in this directory does ``import _bootstrap`` before
importing the package: the script's own directory is always on
``sys.path``, so this resolves regardless of the caller's cwd, and the
repo root (this file's parent's parent) is prepended only when the
package isn't already importable (an installed copy wins).
"""

import importlib.util
import os
import sys

if importlib.util.find_spec("petal_decomposition_tpu") is None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
