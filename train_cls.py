#!/usr/bin/env python
"""Reference-invocation shim: `python train_cls.py ...` == `python cli/train_cls.py ...`
(the reference's entry script of the same name runs unchanged)."""
import os
import runpy
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
runpy.run_path(os.path.join(os.path.dirname(os.path.abspath(__file__)), "cli", "train_cls.py"), run_name="__main__")
