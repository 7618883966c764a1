"""Differential harness: my CLI vs the reference CLI on randomized data.

Generates small-but-adversarial FASTA/FASTQ corpora (shared segments,
N runs, duplicate descriptions, chimeric/unmapped reads, spread-out
quality strings) and compares stdout/stderr/exit codes over a grid of
task/flag scenarios.  Used interactively during development and by the
golden-recording script.
"""

from __future__ import annotations

import os
import random
import subprocess
import sys

REF_DIR = "/root/reference/src"
MY_DIR = "/root/repo"

QUALITY_CHARS = (
    r"`1234567890-=qwertyuiop[]\asdfghjkl;'zxcvbnm,./"
    r'~!@#$%^&*()_+QWERTYUIOP{}|ASDFGHJKL:"ZXCVBNM<>?'
)


def gen_corpus(rng: random.Random, n_genomes=4, glen=300, n_reads=40,
               read_len=50, k_for_sampling=31, with_n=True,
               dup_description=False, similar_pair=True):
    genomes = []
    base = "".join(rng.choice("ACGT") for _ in range(glen))
    for gi in range(n_genomes):
        if similar_pair and gi == 1:
            # genome 1 heavily overlaps genome 0
            seq = base[: glen * 3 // 4] + "".join(
                rng.choice("ACGT") for _ in range(glen // 4)
            )
        else:
            seq = "".join(rng.choice("ACGT") for _ in range(glen))
            # splice in a shared segment to create multi-mapping k-mers
            if gi >= 2:
                start = rng.randrange(0, glen - 60)
                seq = seq[:start] + base[100:160] + seq[start + 60:]
        if with_n and rng.random() < 0.5:
            pos = rng.randrange(0, len(seq) - 5)
            seq = seq[:pos] + "N" * rng.randrange(1, 4) + seq[pos + 3:]
        name = f"genome_{gi}"
        if dup_description and gi == n_genomes - 1:
            name = "genome_0"
        genomes.append((name, seq))

    fasta_lines = []
    for name, seq in genomes:
        fasta_lines.append(f">{name}")
        # multi-line sequences
        for i in range(0, len(seq), 70):
            fasta_lines.append(seq[i: i + 70])
    fasta = "\n".join(fasta_lines) + "\n"

    fastq_lines = []
    for ri in range(n_reads):
        kind = rng.random()
        if kind < 0.55:
            gname, gseq = genomes[rng.randrange(len(genomes))]
            gseq = gseq.replace("N", "A")
            start = rng.randrange(0, max(len(gseq) - read_len, 1))
            seq = gseq[start: start + read_len]
        elif kind < 0.75:
            # chimeric: halves from two genomes
            g1 = genomes[rng.randrange(len(genomes))][1].replace("N", "A")
            g2 = genomes[rng.randrange(len(genomes))][1].replace("N", "A")
            s1 = rng.randrange(0, max(len(g1) - read_len // 2, 1))
            s2 = rng.randrange(0, max(len(g2) - read_len // 2, 1))
            seq = g1[s1: s1 + read_len // 2] + g2[s2: s2 + read_len // 2]
        else:
            seq = "".join(rng.choice("ACGT") for _ in range(read_len))
        if len(seq) < read_len:
            seq = seq + "".join(rng.choice("ACGT") for _ in range(read_len - len(seq)))
        qual = "".join(rng.choice(QUALITY_CHARS) for _ in range(len(seq)))
        fastq_lines += [f"@read_{ri}", seq, "+", qual]
    fastq = "\n".join(fastq_lines) + "\n"
    return fasta, fastq


def run_cli(cwd: str, args, env_extra=None):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    if env_extra:
        env.update(env_extra)
    out = subprocess.run(
        [sys.executable, "main.py"] + args,
        cwd=cwd, capture_output=True, text=True, env=env, timeout=600,
    )
    return out.returncode, out.stdout, out.stderr


def scenarios(fa: str, fq: str, k: int):
    base = ["-g", fa, "-k", str(k)]
    yield "dumpref", ["-t", "dumpref"] + base
    yield "dumpref-sim75", ["-t", "dumpref"] + base + [
        "--filter-similar", "--similarity-threshold", "0.75"]
    yield "dumpref-sim0", ["-t", "dumpref"] + base + [
        "--filter-similar", "--similarity-threshold", "0"]
    al = ["-t", "dumpalign"] + base + ["--reads", fq]
    yield "plain", al
    yield "m2", al + ["-m", "2"]
    yield "m0", al + ["-m", "0"]
    yield "p0", al + ["-p", "0"]
    yield "p5", al + ["-p", "5"]
    yield "pneg", al + ["-p", "-1"]
    yield "mrq", al + ["--min-read-quality", "79"]
    yield "mkq", al + ["--min-kmer-quality", "80"]
    yield "mg0", al + ["--max-genomes", "0"]
    yield "mg1", al + ["--max-genomes", "1"]
    yield "mg2", al + ["--max-genomes", "2"]
    yield "combo", al + ["--min-read-quality", "75", "--min-kmer-quality", "82",
                         "--max-genomes", "2", "-m", "2", "-p", "3"]
    yield "sim-align", al + ["--filter-similar", "--similarity-threshold", "0.5"]


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    import tempfile

    failures = 0
    for rnd in range(n_rounds):
        rng = random.Random(seed + rnd)
        # k > 31 exercises the multi-word key path (the round-2 silent-
        # corruption bug lived exactly in the k range this list used to cap)
        k = rng.choice([5, 11, 21, 31, 40, 64, 75, 150])
        if k <= 31:
            read_len = rng.choice([40, 60])
            glen = rng.choice([120, 300])
        else:
            read_len = k + rng.choice([0, 10, 45])
            glen = max(300, 3 * k)
        fasta, fastq = gen_corpus(
            rng,
            n_genomes=rng.choice([2, 4, 6]),
            glen=glen,
            n_reads=40,
            read_len=read_len,
            dup_description=(rnd % 3 == 2),
        )
        with tempfile.TemporaryDirectory() as td:
            fa = os.path.join(td, "g.fa")
            fq = os.path.join(td, "r.fq")
            open(fa, "w").write(fasta)
            open(fq, "w").write(fastq)
            for name, args in scenarios(fa, fq, k):
                rc_r, out_r, err_r = run_cli(REF_DIR, args)
                rc_m, out_m, err_m = run_cli(
                    MY_DIR, args + ["--batch-size", "64"],
                    env_extra={"SHOTGUN_TPU_PLATFORM": "cpu"},
                )
                ok = (rc_r == rc_m) and (out_r == out_m)
                status = "OK " if ok else "FAIL"
                print(f"[{status}] round={rnd} k={k} {name}")
                if not ok:
                    failures += 1
                    print(f"  rc ref={rc_r} mine={rc_m}")
                    if out_r != out_m:
                        import difflib
                        diff = list(difflib.unified_diff(
                            out_r.splitlines(), out_m.splitlines(),
                            "ref", "mine", lineterm=""))
                        print("\n".join(diff[:40]))
                    if err_m.strip():
                        print("  my stderr:", err_m.strip()[:500])
    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
