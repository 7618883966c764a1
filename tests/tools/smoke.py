"""Dev smoke: run my stack and the reference side-by-side on tiny data."""
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

FASTA = """>genomeA
ACGTACGTACGTACGTCCCC
>genomeB
ACGTACGTACGTACGTGGGG
>genomeC
TTTTTTTTTTTTTTTTTTTT
"""
FASTQ = """@read1
ACGTACGTACGTACGTCCCC
+
IIIIIIIIIIIIIIIIIIII
@read2
TTTTTTTTTTTTTTTTTT
+
IIIIIIIIIIIIIIIIII
@read3
CCCCGGGGAAAATTTTCCGG
+
IIIIIIIIIIIIIIIIIIII
"""

K = 9


def run_reference(task, fa, fq, extra=()):
    cmd = [sys.executable, "main.py", "-t", task, "-g", fa, "-k", str(K)]
    if fq:
        cmd += ["--reads", fq]
    cmd += list(extra)
    out = subprocess.run(
        cmd, cwd="/root/reference/src", capture_output=True, text=True
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr)
    return out.stdout


def main():
    with tempfile.TemporaryDirectory() as td:
        fa = os.path.join(td, "g.fa")
        fq = os.path.join(td, "r.fq")
        open(fa, "w").write(FASTA)
        open(fq, "w").write(FASTQ)

        ref_dumpref = run_reference("dumpref", fa, None)
        ref_dumpalign = run_reference("dumpalign", fa, fq)

        from shotgun_tpu.io.data_file import FASTAFile, FASTAQFile
        from shotgun_tpu.reference import KmerReference
        from shotgun_tpu.aligner import PseudoAlignment

        ref = KmerReference(K, FASTAFile(fa).container)
        mine_dumpref = json.dumps(ref.get_summary(), indent=4) + "\n"
        aln = PseudoAlignment(ref)
        aln.align_reads_from_container(FASTAQFile(fq).container)
        mine_dumpalign = json.dumps(aln.get_summary(), indent=4) + "\n"

        print("dumpref match:", mine_dumpref == ref_dumpref)
        print("dumpalign match:", mine_dumpalign == ref_dumpalign)
        if mine_dumpref != ref_dumpref:
            print("=== ref ==="); print(ref_dumpref)
            print("=== mine ==="); print(mine_dumpref)
        if mine_dumpalign != ref_dumpalign:
            print("=== ref ==="); print(ref_dumpalign)
            print("=== mine ==="); print(mine_dumpalign)

        # host single-read path agreement
        aln2 = PseudoAlignment(ref)
        for rec in FASTAQFile(fq).container:
            aln2.add_read_from_read_record(rec)
        host_dump = json.dumps(aln2.get_summary(), indent=4) + "\n"
        print("host-path match:", host_dump == ref_dumpalign)
        if host_dump != ref_dumpalign:
            print("=== host ==="); print(host_dump)


if __name__ == "__main__":
    main()
