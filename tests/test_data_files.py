"""File-layer tests: extensions, gzip transparency, error wrapping."""

import gzip
import pickle

import pytest

from shotgun_tpu.io.data_file import (
    FASTAFile,
    FASTAQFile,
    InvalidExtensionError,
    NoRecordsInDataFile,
)


def test_fasta_plain(tmp_path, tiny_fasta):
    fa = tmp_path / "g.fa"
    fa.write_text(tiny_fasta)
    f = FASTAFile(str(fa))
    assert len(list(f.container)) == 3


def test_fasta_gzip(tmp_path, tiny_fasta):
    fa = tmp_path / "g.fa.gz"
    with gzip.open(fa, "wt") as fh:
        fh.write(tiny_fasta)
    assert len(list(FASTAFile(str(fa)).container)) == 3


def test_fastq_plain_and_gzip(tmp_path, tiny_fastq):
    fq = tmp_path / "r.fq"
    fq.write_text(tiny_fastq)
    assert len(list(FASTAQFile(str(fq)).container)) == 2
    fqz = tmp_path / "r.fq.gz"
    with gzip.open(fqz, "wt") as fh:
        fh.write(tiny_fastq)
    assert len(list(FASTAQFile(str(fqz)).container)) == 2


def test_invalid_extension(tmp_path, tiny_fasta):
    bad = tmp_path / "g.txt"
    bad.write_text(tiny_fasta)
    with pytest.raises(InvalidExtensionError):
        FASTAFile(str(bad))
    with pytest.raises(InvalidExtensionError):
        FASTAQFile(str(bad))


def test_empty_file_raises(tmp_path):
    fa = tmp_path / "e.fa"
    fa.write_text("")
    with pytest.raises(NoRecordsInDataFile):
        FASTAFile(str(fa))


def test_container_dump_roundtrip(tmp_path, tiny_fasta):
    fa = tmp_path / "g.fa"
    fa.write_text(tiny_fasta)
    f = FASTAFile(str(fa))
    out = tmp_path / "dump.pkl"
    f.dump(str(out))
    with open(out, "rb") as fh:
        container = pickle.load(fh)
    assert [r.identifier for r in container] == [
        r.identifier for r in f.container
    ]
