#!/usr/bin/env python3
"""Fixture generator for the q_xz_ingest gate: 12 .xz files produced
by the SYSTEM xz CLI over GENERATOR-DETERMINISTIC content, so the
DuckDB oracle can rebuild every decoded line analytically (no pinned
constants). Variants sweep presets, explicit lc/lp/pb shapes, every
check type, forced multi-block, and a concatenated two-stream file.

Content formula (mirrored in the gate's oracle SQL):
  fixture k has lines i in [0, 20 + 5k)
  line i = "doc" + (k*100+i) + "\t" + words
  words  = "w" + ((k*31 + i*17 + j*13) % 101) for j in [0, 5 + i%7)
  every line is terminated with "\n"
"""
import os
import subprocess
import sys

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "main", "resources", "graft", "xz")

VARIANTS = [
    ["-0"],
    ["-6"],
    ["-9e"],
    ["--lzma2=preset=6,lc=0,lp=2,pb=0"],
    ["--lzma2=preset=6,lc=4,lp=0,pb=1"],
    ["--check=crc32"],
    ["--check=sha256"],
    ["--check=none"],
    ["--block-size=1024", "-1"],
    ["--lzma2=preset=1,lc=0,lp=0,pb=0"],
    ["-6"],        # reserved for future variant churn
    None,           # k=11: concatenated two-stream file
    "lzma-alone",   # k=12: legacy .lzma container (xz --format=lzma)
]


def line(k, i):
    words = " ".join(f"w{(k * 31 + i * 17 + j * 13) % 101}"
                     for j in range(5 + i % 7))
    return f"doc{k * 100 + i}\t{words}\n"


def content(k, lo, hi):
    return "".join(line(k, i) for i in range(lo, hi)).encode()


def xz(args, data):
    p = subprocess.run(["xz", "-z", "-c", "-T", "1"] + args,
                       input=data, capture_output=True)
    assert p.returncode == 0, p.stderr
    return p.stdout


def main():
    os.makedirs(OUT, exist_ok=True)
    for k, v in enumerate(VARIANTS):
        n = 20 + 5 * k
        ext = "xz"
        if v is None:
            half = n // 2
            enc = xz(["-1"], content(k, 0, half)) + \
                xz(["-9"], content(k, half, n))
        elif v == "lzma-alone":
            enc = xz(["--format=lzma", "-6"], content(k, 0, n))
            ext = "lzma"
        else:
            enc = xz(v, content(k, 0, n))
        with open(os.path.join(OUT, f"fixture_{k}.{ext}"), "wb") as f:
            f.write(enc)
        print(k, ext, len(enc))


if __name__ == "__main__":
    sys.exit(main())
