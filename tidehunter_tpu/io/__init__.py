from .codec import encode, revcomp_str, BASES
from .fastx import FastxRecord, read_fastx, read_first_seq
