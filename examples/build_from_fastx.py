#!/usr/bin/env python
"""Minimal usage example: build an index from a FASTA/Q file.

Counterpart of `/root/reference/examples/build_from_fastx.rs`."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cbl_tpu import CBL
from cbl_tpu import io as cio


def main():
    if len(sys.argv) < 2:
        print(f"usage: {sys.argv[0]} <reads.fa[.gz]> [k]", file=sys.stderr)
        return 1
    path = sys.argv[1]
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    index = CBL(k=k)
    codes, offsets = cio.parse_fastx(path)
    index.insert_codes_stream(codes, offsets)
    print(f"{index.count()} distinct {k}-mers in {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
