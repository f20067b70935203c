#!/usr/bin/env python
"""Evaluate entry point — thin wrapper over awsegbench.cli.evaluate (same
flags as the reference scripts/evaluate.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from awsegbench.cli.evaluate import main

if __name__ == '__main__':
    main()
