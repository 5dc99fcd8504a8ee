"""Bundled test-suite runner (mirrors ``toast.tests.run()``,
ref:src/toast/tests/runner.py:140).

The suite ships INSIDE the package (``toast_tpu/tests/suite/``) so an
installed copy can self-test; the repo keeps a ``tests/`` symlink to the
same files for plain ``pytest tests/`` runs.
"""

import subprocess
import sys
from pathlib import Path


def run(verbosity=1):
    """Run the full test suite with pytest; returns the exit code."""
    suite = Path(__file__).parent / "suite"
    args = [sys.executable, "-m", "pytest", str(suite)]
    args.append("-v" if verbosity > 1 else "-q")
    return subprocess.call(args)


test = run
