"""Record RUN_LOG-grade acceptance goldens from the reference CLI.

The reference's canonical demo log (/root/reference/src/RUN_LOG:1-115)
exercises k=31/75/150, 150+ bp reads, --min-read-quality 59,
--min-kmer-quality 60, --max-genomes {0,2}, --similarity-threshold 0.75
and m/p in {1,5} -- on simulated data it does not ship.  This script
synthesizes an equivalent corpus, runs the reference on the same
scenario grid, and records its stdout under tests/golden/runlog/
(gzip-compressed; dumpref outputs are large but highly compressible).

Quality strings are drawn from banded distributions so the raw-ord
quality gates actually bite: ~15% of reads sit in a low band (mean ord
< 59, MRQ-filtered), the rest in a mid band whose per-window means
straddle 60 (MKQ-filtered k-mers appear without wiping out alignment).
"""

from __future__ import annotations

import gzip
import json
import os
import random
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "..", "golden", "runlog")
REF_DIR = "/root/reference/src"

# quality characters by raw ord() band (all members of PHRED33_CHARS)
ALL_Q = (r"`1234567890-=qwertyuiop[]\asdfghjkl;'zxcvbnm,./"
         r'~!@#$%^&*()_+QWERTYUIOP{}|ASDFGHJKL:"ZXCVBNM<>?')
LOW_Q = [c for c in ALL_Q if 40 <= ord(c) <= 58]    # mean < 59
MID_Q = [c for c in ALL_Q if 52 <= ord(c) <= 72]    # windows straddle 60
HIGH_Q = [c for c in ALL_Q if 65 <= ord(c) <= 95]


def gen_genomes(rng: random.Random, n: int, glen: int, similar_pair: bool):
    genomes = []
    base = "".join(rng.choice("ACGT") for _ in range(glen))
    for gi in range(n):
        if similar_pair and gi == 1:
            seq = base[: glen * 4 // 5] + "".join(
                rng.choice("ACGT") for _ in range(glen // 5))
        else:
            seq = "".join(rng.choice("ACGT") for _ in range(glen))
            if gi >= 2:
                # shared 200-base segment -> multi-mapping long k-mers
                start = rng.randrange(0, glen - 220)
                seq = seq[:start] + base[50:250] + seq[start + 200:]
        genomes.append((f"genome_{gi}", seq))
    return genomes


def to_fasta(genomes) -> str:
    lines = []
    for name, seq in genomes:
        lines.append(f">{name}")
        for i in range(0, len(seq), 70):
            lines.append(seq[i: i + 70])
    return "\n".join(lines) + "\n"


def gen_reads(rng: random.Random, genomes, n_reads: int, read_len: int) -> str:
    lines = []
    for ri in range(n_reads):
        kind = rng.random()
        if kind < 0.7:
            _, gseq = genomes[rng.randrange(len(genomes))]
            start = rng.randrange(0, max(len(gseq) - read_len, 1))
            seq = gseq[start: start + read_len]
        elif kind < 0.85:
            g1 = genomes[rng.randrange(len(genomes))][1]
            g2 = genomes[rng.randrange(len(genomes))][1]
            s1 = rng.randrange(0, max(len(g1) - read_len // 2, 1))
            s2 = rng.randrange(0, max(len(g2) - read_len // 2, 1))
            seq = g1[s1: s1 + read_len // 2] + g2[s2: s2 + read_len // 2]
        else:
            seq = "".join(rng.choice("ACGT") for _ in range(read_len))
        if len(seq) < read_len:
            seq += "".join(rng.choice("ACGT") for _ in range(read_len - len(seq)))
        band = rng.random()
        pool = LOW_Q if band < 0.15 else (MID_Q if band < 0.85 else HIGH_Q)
        qual = "".join(rng.choice(pool) for _ in range(read_len))
        lines += [f"@read_{ri}", seq, "+", qual]
    return "\n".join(lines) + "\n"


def runlog_scenarios():
    """name -> reference CLI args (paths relative to the data dir)."""
    small = "data/small.fa"
    mid = "data/mid.fa"
    fq_s = "data/small_se_n1000.fq.gz"
    fq_m = "data/mid_se_n10k.fq.gz"
    y = []
    # RUN_LOG 1-4: reference builds at k=31/75 + dumpref (direct -g/-k form
    # produces identical output to the .kdb round trip, tested separately)
    y.append(("rl-dumpref-small-k75",
              ["-t", "dumpref", "-g", small, "-k", "75"]))
    y.append(("rl-dumpref-small-k150",
              ["-t", "dumpref", "-g", small, "-k", "150"]))
    # RUN_LOG 5-7: k=75 alignment of the small 1000-read file
    y.append(("rl-small-k75-m1p1",
              ["-t", "dumpalign", "-g", small, "-k", "75", "--reads", fq_s,
               "-m", "1", "-p", "1"]))
    y.append(("rl-small-k75-m5p5",
              ["-t", "dumpalign", "-g", small, "-k", "75", "--reads", fq_s,
               "-m", "5", "-p", "5"]))
    # RUN_LOG 8-9: k=150 with the EXTQUALITY flag grid, MG in {2, 0}
    y.append(("rl-mid-k150-flags",
              ["-t", "dumpalign", "-g", mid, "-k", "150", "--reads", fq_m,
               "--min-read-quality", "59", "--min-kmer-quality", "60",
               "--max-genomes", "2"]))
    y.append(("rl-mid-k150-mg0",
              ["-t", "dumpalign", "-g", mid, "-k", "150", "--reads", fq_m,
               "--min-read-quality", "59", "--min-kmer-quality", "60",
               "--max-genomes", "0"]))
    # RUN_LOG 10: EXTSIM at 0.75
    y.append(("rl-dumpref-sim75-small-k31",
              ["-t", "dumpref", "-g", small, "-k", "31",
               "--filter-similar", "--similarity-threshold", "0.75"]))
    # RUN_LOG 11: all flags at once + m variation
    y.append(("rl-small-k31-flags-m1p1",
              ["-t", "dumpalign", "-g", small, "-k", "31", "--reads", fq_s,
               "--min-read-quality", "59", "--min-kmer-quality", "60",
               "--max-genomes", "2", "-m", "1", "-p", "1"]))
    y.append(("rl-small-k31-m5p1",
              ["-t", "dumpalign", "-g", small, "-k", "31", "--reads", fq_s,
               "-m", "5", "-p", "1"]))
    return y


def main():
    data = os.path.join(GOLDEN, "data")
    os.makedirs(data, exist_ok=True)
    rng = random.Random(20260819)

    small = gen_genomes(rng, 4, 800, similar_pair=True)
    mid = gen_genomes(rng, 5, 1200, similar_pair=False)
    open(os.path.join(data, "small.fa"), "w").write(to_fasta(small))
    open(os.path.join(data, "mid.fa"), "w").write(to_fasta(mid))
    with gzip.open(os.path.join(data, "small_se_n1000.fq.gz"), "wt") as fh:
        fh.write(gen_reads(rng, small, 1000, 150))
    with gzip.open(os.path.join(data, "mid_se_n10k.fq.gz"), "wt") as fh:
        fh.write(gen_reads(rng, mid, 10_000, 160))

    manifest = {}
    for name, args in runlog_scenarios():
        abs_args = [a.replace("data/", data + "/") for a in args]
        out = subprocess.run(
            [sys.executable, "main.py"] + abs_args,
            cwd=REF_DIR, capture_output=True, text=True, timeout=1800,
        )
        assert out.returncode == 0, (name, out.stderr[-500:])
        with gzip.open(os.path.join(GOLDEN, f"{name}.out.gz"), "wt") as fh:
            fh.write(out.stdout)
        manifest[name] = {"args": args}
        print("recorded", name, len(out.stdout), "bytes")
    with open(os.path.join(GOLDEN, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)


if __name__ == "__main__":
    main()
