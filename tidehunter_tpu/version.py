__version__ = "0.1.0"
PROG = "TideHunter-TPU"
# CLI surface parity target: TideHunter v1.5.5 (reference src/main.c:13)
REFERENCE_VERSION = "1.5.5"
