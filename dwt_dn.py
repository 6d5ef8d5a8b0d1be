#!/usr/bin/env python
"""Reference-invocation shim: `python dwt_dn.py ...` == `python cli/dwt_dn.py ...`
(the reference's entry script of the same name runs unchanged). Guarded so
importing this module (e.g. pytest collection of test_cls.py) is a no-op."""
import os
import runpy
import sys

if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    runpy.run_path(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "cli", "dwt_dn.py"),
        run_name="__main__",
    )
