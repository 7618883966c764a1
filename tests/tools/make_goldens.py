"""Record reference-CLI outputs as golden files for the test suite.

Run once (requires /root/reference); writes the corpus + expected stdout
for each scenario under tests/golden/.  test_cli.py replays my CLI against
these files byte-for-byte.
"""

from __future__ import annotations

import json
import os
import random
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(HERE, "..", "golden")
REF_DIR = "/root/reference/src"

sys.path.insert(0, HERE)
from diff_cli import gen_corpus, scenarios  # noqa: E402


def main():
    os.makedirs(os.path.join(GOLDEN, "data"), exist_ok=True)
    rng = random.Random(42)
    fasta, fastq = gen_corpus(rng, n_genomes=5, glen=240, n_reads=50,
                              read_len=45, dup_description=True)
    k = 11
    fa = os.path.join(GOLDEN, "data", "corpus.fa")
    fq = os.path.join(GOLDEN, "data", "corpus.fq")
    open(fa, "w").write(fasta)
    open(fq, "w").write(fastq)

    manifest = {}
    for name, args in scenarios("data/corpus.fa", "data/corpus.fq", k):
        abs_args = [
            a.replace("data/", os.path.join(GOLDEN, "data") + "/") for a in args
        ]
        out = subprocess.run(
            [sys.executable, "main.py"] + abs_args,
            cwd=REF_DIR, capture_output=True, text=True, timeout=600,
        )
        assert out.returncode == 0, (name, out.stderr)
        golden_path = os.path.join(GOLDEN, f"{name}.out")
        open(golden_path, "w").write(out.stdout)
        manifest[name] = {"args": args, "k": k}
        print("recorded", name, len(out.stdout), "bytes")
    with open(os.path.join(GOLDEN, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2)


if __name__ == "__main__":
    main()
