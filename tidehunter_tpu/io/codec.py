"""Sequence codec: ASCII <-> {A,C,G,T,N} = {0,1,2,3,4}.

Table semantics mirror the reference codec (reference src/seq.c:15-52):
upper/lowercase acgt map to 0..3, everything else to 4 (N); complement
maps A<->T, C<->G, N->N. Implemented as vectorized NumPy lookups so a whole
read (or a padded batch of reads) encodes in one gather.
"""

from __future__ import annotations

import numpy as np

BASES = "ACGTN"

# ASCII -> 0..4 (reference src/seq.c:15-32, nst_nt4_table)
NT4_TABLE = np.full(256, 4, dtype=np.uint8)
for _i, _c in enumerate("ACGT"):
    NT4_TABLE[ord(_c)] = _i
    NT4_TABLE[ord(_c.lower())] = _i

# ASCII -> complement code (reference src/seq.c:35-52, com_nst_nt4_table)
COMP_TABLE = np.full(256, 4, dtype=np.uint8)
for _i, _c in enumerate("ACGT"):
    COMP_TABLE[ord(_c)] = 3 - _i
    COMP_TABLE[ord(_c.lower())] = 3 - _i

_CODE_TO_CHAR = np.frombuffer(BASES.encode(), dtype=np.uint8)


def encode(seq: str | bytes) -> np.ndarray:
    """ASCII sequence -> uint8 codes 0..4 (reference src/seq.c:77-86)."""
    if isinstance(seq, str):
        seq = seq.encode()
    return NT4_TABLE[np.frombuffer(seq, dtype=np.uint8)]


def decode(bseq: np.ndarray) -> str:
    """uint8 codes 0..4 -> ASCII string over 'ACGTN'."""
    return _CODE_TO_CHAR[np.asarray(bseq, dtype=np.uint8)].tobytes().decode()


def revcomp_str(seq: str) -> str:
    """Reverse complement as string over ACGTN (reference src/seq.c:88-95)."""
    codes = COMP_TABLE[np.frombuffer(seq.encode(), dtype=np.uint8)]
    return _CODE_TO_CHAR[codes[::-1]].tobytes().decode()


def revcomp_codes(bseq: np.ndarray) -> np.ndarray:
    """Reverse complement on 0..4 codes: A<->T, C<->G, N->N."""
    comp = np.where(bseq < 4, 3 - bseq, bseq).astype(np.uint8)
    return comp[::-1]
