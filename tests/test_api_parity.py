"""Reference API-surface parity: the public names and behaviors a user of
the reference repo would reach for (SURVEY.md §1 public API)."""

import pytest

import shotgun_tpu
from shotgun_tpu.aligner import (
    KmerSpecifity,
    PseudoAlignment,
    Read,
    ReadMappingType,
)
from shotgun_tpu.io.records import FASTAParser, FASTQParser
from shotgun_tpu.reference import (
    KmerReference,
    extract_kmers_from_genome,
    reverse_complement,
)


def _ref(fasta, k):
    p = FASTAParser()
    p.parse_records(fasta)
    return KmerReference(k, p)


def _read(fastq):
    p = FASTQParser()
    p.parse_records(fastq)
    return Read(list(p)[0])


def test_reverse_complement():
    assert reverse_complement("ACGT") == "ACGT"
    assert reverse_complement("AAGG") == "CCTT"
    assert reverse_complement("A") == "T"


def test_extract_kmers_from_genome():
    assert list(extract_kmers_from_genome(3, "ACGTA")) == [
        (0, "ACG"), (1, "CGT"), (2, "GTA")]
    assert list(extract_kmers_from_genome(9, "ACGT")) == []
    assert list(extract_kmers_from_genome(0, "ACGT")) == []


def test_kmer_reference_attrs():
    ref = _ref(">g1\nACGTACGT\n", 4)
    assert ref.kmer_len == 4
    assert [g.identifier for g in ref.genomes] == ["g1"]
    assert ref.similarity_info is None


def test_get_kmer_and_reverse_references():
    # ACGT's revcomp is itself; AAAA's is TTTT
    ref = _ref(">g1\nAAAACGT\n", 4)
    both = ref.get_kmer_and_reverse_references("TTTT")
    # TTTT absent, but its revcomp AAAA is present
    (rec, positions), = both.items()
    assert positions == {0}
    direct = ref.get_kmer_references("TTTT")
    assert direct == {}


def test_read_method_decomposition():
    ref = _ref(">g1\nAAAACCCC\n>g2\nGGGGTTTT\n", 4)
    read = _read("@r\nAAAACCCC\n+\nIIIIIIII\n")
    read.extract_kmer_references(ref)
    assert len(read.kmers) == 5
    counts = read.generate_genome_counts(map_count=True)
    assert {g.identifier: c for g, c in counts.items()} == {"g1": 5}
    assert read.try_to_align_specific(1) is True
    assert read.mapping.type == ReadMappingType.UNIQUELY_MAPPED
    read.validate_unique_mappings(1)
    assert read.mapping.type == ReadMappingType.UNIQUELY_MAPPED
    kmer = read.kmers["AAAA"]
    assert kmer.specifity == KmerSpecifity.SPECIFIC
    (rec, positions), = kmer.references.items()
    assert positions == {0}


def test_mean_and_kmer_quality_raw_ord():
    read = _read("@r\nACGT\n+\n!I!I\n")
    # raw ord values, no PHRED offset: (33+73+33+73)/4
    assert read.mean_quality() == (33 + 73 + 33 + 73) / 4
    assert read.kmer_quality(0, 2) == (33 + 73) / 2


def test_get_reads_by_mapping_type():
    ref = _ref(">g1\nAAAACCCC\n", 4)
    aln = PseudoAlignment(ref)
    p = FASTQParser()
    p.parse_records("@u\nAAAACCCC\n+\nIIIIIIII\n@n\nGGGGGGGG\n+\nIIIIIIII\n")
    for rec in p:
        aln.add_read_from_read_record(rec)
    assert aln.get_reads_by_mapping_type(ReadMappingType.UNIQUELY_MAPPED) == ["u"]
    assert aln.get_reads_by_mapping_type(ReadMappingType.UNMAPPED) == ["n"]


def test_lazy_package_exports():
    assert shotgun_tpu.KmerReference is KmerReference
    assert shotgun_tpu.ReadMappingType is ReadMappingType
    assert shotgun_tpu.FASTAFile.__name__ == "FASTAFile"
    with pytest.raises(AttributeError):
        shotgun_tpu.does_not_exist
