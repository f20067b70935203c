#!/usr/bin/env python
"""Train entry point — thin wrapper over awsegbench.cli.train (same flags
as the reference scripts/train.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from awsegbench.cli.train import main

if __name__ == '__main__':
    main()
