"""Output serializers: FASTA / Tabular / FASTQ / Tabular+qual / unit mode.

Byte-format contract from the reference serializer (reference
src/main.c:214-271) and README.md:199-296. Parity-critical details kept
deliberately:

* header: ``>name_repN_copyNum readLen_start_end_consLen_aveMatch_fullLen_subPos``
* coordinates are 1-based; subPos prints ``sub_pos[i]+2`` for all but the
  last entry and ``sub_pos[-1]+1`` for the last (reference src/main.c:239-246)
* unit-mode FASTA slices ``seq[sub_pos[i]+1 : sub_pos[i+1]+1]`` (end
  inclusive) while unit-mode TAB slices ``seq[sub_pos[i]+1 : sub_pos[i+1]]``
  (end exclusive) — the reference's two loops really do differ
  (src/main.c:224 ``<=`` vs src/main.c:231 ``<``)
* copyNum / aveMatch print as ``%.1f``

The reference recycles per-read buffers across 4096-read chunks and leaks
stale FASTQ quality bytes from the previous chunk (src/main.c:266-268 resets
``seq.l`` but not ``qual.l``); we intentionally do NOT reproduce that bug.
"""

from __future__ import annotations

import dataclasses
from typing import IO, List, Optional

from ..params import FASTA_FMT, FASTQ_FMT, TAB_FMT, TAB_QUAL_FMT, Params


@dataclasses.dataclass
class ConsRecord:
    """One consensus record (reference tandem_seq_t slot, src/tidehunter.h:63-72)."""

    seq: str = ""
    qual: Optional[str] = None        # phred+33 chars, only for -f 3/4
    start: int = 0                    # 0-based TR start on the read
    end: int = 0                      # 0-based TR end on the read
    copy_num: float = 0.0
    ave_match: float = 0.0
    full_length: int = 0              # 0 / 1 (sense) / 2 (anti-sense)
    sub_pos: List[int] = dataclasses.field(default_factory=list)
    is_unit: bool = False             # unit-mode record (no consensus seq)

    @property
    def cons_len(self) -> int:
        return len(self.seq)


class TandemResult:
    """Per-read accumulator with the reference's record-admission filters
    (write_tandem_cons_seq, reference src/gen_cons.c:10-62)."""

    def __init__(self) -> None:
        self.records: List[ConsRecord] = []

    def add_cons(self, rec: ConsRecord, mtp: Params) -> None:
        if rec.cons_len < mtp.min_len or rec.cons_len > mtp.max_p:
            return
        if mtp.only_longest and len(self.records) == 1:
            old = self.records[0]
            if rec.end - rec.start > old.end - old.start:
                self.records.clear()
            else:
                return
        self.records.append(rec)

    def add_unit(self, sub_pos: List[int]) -> None:
        """Unit-mode record (write_tandem_unit, reference src/gen_cons.c:64-83)."""
        self.records.append(ConsRecord(sub_pos=list(sub_pos), is_unit=True))


def write_read_output(
    out: IO[str],
    read_name: str,
    read_seq: str,
    result: TandemResult,
    mtp: Params,
) -> None:
    """Serialize one read's records (reference src/main.c:214-271)."""
    read_len = len(read_seq)
    for cons_i, rec in enumerate(result.records):
        if mtp.only_unit:
            sp = rec.sub_pos
            if mtp.out_fmt == FASTA_FMT:
                for i in range(len(sp) - 1):
                    out.write(f">{read_name}_rep{cons_i}_sub{i}\n")
                    out.write(read_seq[sp[i] + 1 : sp[i + 1] + 1])
                    out.write("\n")
            elif mtp.out_fmt == TAB_FMT:
                for i in range(len(sp) - 1):
                    out.write(f"{read_name}\trep{cons_i}\tsub{i}\t")
                    out.write(read_seq[sp[i] + 1 : sp[i + 1]])
                    out.write("\n")
            continue

        sub = ",".join(
            [str(p + 2) for p in rec.sub_pos[:-1]] + [str(rec.sub_pos[-1] + 1)]
        )
        fields = (
            f"{rec.copy_num:.1f}\t{read_len}\t{rec.start + 1}\t{rec.end + 1}\t"
            f"{rec.cons_len}\t{rec.ave_match:.1f}\t{rec.full_length}\t{sub}"
        )
        if mtp.out_fmt == FASTA_FMT:
            out.write(
                f">{read_name}_rep{cons_i}_{rec.copy_num:.1f} "
                f"{read_len}_{rec.start + 1}_{rec.end + 1}_{rec.cons_len}_"
                f"{rec.ave_match:.1f}_{rec.full_length}_{sub}\n{rec.seq}\n"
            )
        elif mtp.out_fmt in (TAB_FMT, TAB_QUAL_FMT):
            out.write(f"{read_name}\trep{cons_i}\t{fields}\t{rec.seq}")
            if mtp.out_fmt == TAB_QUAL_FMT:
                out.write(f"\t{rec.qual or ''}")
            out.write("\n")
        elif mtp.out_fmt == FASTQ_FMT:
            out.write(
                f"@{read_name}_rep{cons_i}_{rec.copy_num:.1f} "
                f"{read_len}_{rec.start + 1}_{rec.end + 1}_{rec.cons_len}_"
                f"{rec.ave_match:.1f}_{rec.full_length}_{sub}\n"
                f"{rec.seq}\n+\n{rec.qual or ''}\n"
            )
