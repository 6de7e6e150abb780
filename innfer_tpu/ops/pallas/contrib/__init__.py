"""Experimental Pallas kernels — probed floors, NOT production paths.

Everything here was engineered, interpret-verified, and measured on-chip,
but does not currently pay its way (see each module's STATUS header and
BASELINE.md "PPON's floor"):

  * ``rdb_banded``  — banded-matmul RDB formulation (~7 TF/s on this
    backend vs 40+ for the production ``ops.pallas.rdb``; Mosaic's
    per-iteration code floor dominates its many small matmuls).
  * ``resblock32`` — fused PPON ResBlock_32; compiles on-chip only at
    reduced widths (nf<=32, +11%), remote Mosaic rejects real nf=64.
    Opt-in via PPON ``backend='pallas'``.

The production kernel surface is ``innfer_tpu.ops.pallas.rdb`` only.
These are kept as documented starting points for future backend revisions
(a newer Mosaic may lift the nf=64 rejection) and as evidence of probed
hardware floors.
"""
