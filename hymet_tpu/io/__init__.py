"""Host I/O layer: FASTA / PAF / sketch-DB formats.

File formats match the reference pipeline's intermediate contracts
(SURVEY.md §1): PAF rows feed the classifier
(reference ``scripts/classification_cami.py:181-208``), FASTA feeds the
sketch and minimizer engines. A C++ fast path (``native/``) accelerates
FASTA parsing + 2-bit packing when built; a pure-Python fallback is always
available.
"""

from hymet_tpu.io.fasta import read_fasta, iter_fasta, pack_2bit
from hymet_tpu.io.paf import PafRecord, read_paf, write_paf

__all__ = [
    "read_fasta",
    "iter_fasta",
    "pack_2bit",
    "PafRecord",
    "read_paf",
    "write_paf",
]
