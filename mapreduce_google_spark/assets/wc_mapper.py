#!/usr/bin/env python3
"""Hadoop-streaming-style word-count mapper (engine test asset).

Contract (reference mapper surface, ``worker/__main__.py:167-186``): read
text lines on stdin, emit ``key\\tvalue`` lines on stdout. Semantics match
the engine's T01 tokenizer: lowercase, whitespace-split, drop empty
tokens.
"""
import sys

for line in sys.stdin:
    for token in line.lower().split():
        sys.stdout.write(f"{token}\t1\n")
