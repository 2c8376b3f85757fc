#!/usr/bin/env python3
"""Hadoop-streaming-style word-count reducer (engine test asset).

Contract (reference reducer surface, ``worker/__main__.py:241-249``):
stdin is a key-sorted stream of ``key\\tvalue`` lines; all lines for one
key are contiguous. Emits ``key\\tsum`` per group.
"""
import sys
from itertools import groupby


def key_of(line: str) -> str:
    return line.partition("\t")[0]


for key, group in groupby(sys.stdin, key=key_of):
    total = sum(int(line.rstrip("\n").partition("\t")[2] or 0) for line in group)
    sys.stdout.write(f"{key}\t{total}\n")
