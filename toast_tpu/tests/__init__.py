"""Bundled test-suite runner (mirrors ``toast.tests.run()``)."""

import subprocess
import sys
from pathlib import Path


def run(verbosity=1):
    """Run the full test suite with pytest; returns the exit code."""
    root = Path(__file__).parent.parent.parent
    args = [sys.executable, "-m", "pytest", str(root / "tests")]
    args.append("-v" if verbosity > 1 else "-q")
    return subprocess.call(args)


test = run
