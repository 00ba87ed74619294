"""Streaming FASTA/FASTQ reader (plain or gzip).

Functional equivalent of the reference's klib kseq parser
(reference src/kseq.h:176-246): handles multi-line FASTA, FASTQ with
multi-line quality, '>'/'@' headers, and whitespace-split names. Gzip is
auto-detected by magic bytes so `.fa`, `.fq`, `.fa.gz`, `.fq.gz` all work
(reference README.md:190).
"""

from __future__ import annotations

import dataclasses
import gzip
import io
from typing import Iterator, Optional


@dataclasses.dataclass
class FastxRecord:
    name: str                 # first whitespace-delimited token of the header
    comment: str              # rest of the header (may be "")
    seq: str
    qual: Optional[str] = None

    def __len__(self) -> int:
        return len(self.seq)


def _open_text(path: str) -> io.TextIOBase:
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return io.TextIOWrapper(
            io.BufferedReader(gzip.GzipFile(fileobj=f), buffer_size=1 << 20)
        )
    return io.TextIOWrapper(io.BufferedReader(f, buffer_size=1 << 20))


def read_fastx(path: str) -> Iterator[FastxRecord]:
    """Yield records in file order (kseq_read semantics, src/kseq.h:176)."""
    fh = _open_text(path)
    try:
        line = fh.readline()
        # skip any leading junk until a header, like kseq does
        while line and line[0] not in ">@":
            line = fh.readline()
        while line:
            header = line[1:].rstrip("\n")
            parts = header.split(None, 1)
            name = parts[0] if parts else ""
            comment = parts[1] if len(parts) > 1 else ""
            is_fastq = line[0] == "@"
            seq_chunks = []
            line = fh.readline()
            while line and line[0] not in ">@+":
                seq_chunks.append(line.strip())
                line = fh.readline()
            seq = "".join(seq_chunks)
            qual = None
            if is_fastq and line and line[0] == "+":
                qual_chunks, qlen = [], 0
                line = fh.readline()
                while line and qlen < len(seq):
                    q = line.strip()
                    qual_chunks.append(q)
                    qlen += len(q)
                    line = fh.readline()
                qual = "".join(qual_chunks)
            yield FastxRecord(name=name, comment=comment, seq=seq, qual=qual)
    finally:
        fh.close()


def read_first_seq(path: str) -> str:
    """First sequence of a FASTA/FASTQ file (reference src/main.c:157-171,
    used to load adapter sequences)."""
    for rec in read_fastx(path):
        return rec.seq
    raise ValueError(f"No sequence found in {path}")
