"""Drop-in compatible entry point mirroring the reference's ``run.py``.

    python run.py -m 4x_model.pth [-a infer] [-i ./input] [-o ./output] ...

Delegates to the innfer_tpu CLI (innfer_tpu/cli.py), which keeps the
reference flag semantics (/root/reference/run.py:321-447) and adds the
TPU-native controls.
"""
import sys

from innfer_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
