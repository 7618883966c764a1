"""Alignment semantics: hand-crafted scenarios with exact expectations,
host-vs-device agreement, and a randomized differential test against the
independent dict oracle (coverage model: reference test_kmer.py)."""

import random

import pytest

from shotgun_tpu.aligner import (
    AddingExistingRead,
    PseudoAlignment,
    Read,
    ReadMappingType,
)
from shotgun_tpu.io.records import FASTAParser, FASTQParser
from shotgun_tpu.reference import KmerReference

from oracle_model import align_read, build_db, summarize

QUALITY_CHARS = (
    r"`1234567890-=qwertyuiop[]\asdfghjkl;'zxcvbnm,./"
    r'~!@#$%^&*()_+QWERTYUIOP{}|ASDFGHJKL:"ZXCVBNM<>?'
)


def make_ref(fasta_text, k):
    p = FASTAParser()
    p.parse_records(fasta_text)
    return KmerReference(k, list(p))


def make_reads(fastq_text):
    p = FASTQParser()
    p.parse_records(fastq_text)
    return list(p)


def fastq_of(reads):
    lines = []
    for i, (seq, qual) in enumerate(reads):
        lines += [f"@r{i}", seq, "+", qual]
    return "\n".join(lines) + "\n"


# --- hand-crafted outcomes -------------------------------------------------

def test_unmapped_read():
    ref = make_ref(">g1\nAAAAAAAAAA\n", 4)
    (rec,) = make_reads("@r\nCCCCCCCCCC\n+\nIIIIIIIIII\n")
    read = Read(rec)
    assert read.pseudo_align(ref) == ReadMappingType.UNMAPPED


def test_unique_read():
    ref = make_ref(">g1\nAAAACCCCGGGG\n>g2\nTTTTTTTTTTTT\n", 4)
    (rec,) = make_reads("@r\nAAAACCCC\n+\nIIIIIIII\n")
    read = Read(rec)
    assert read.pseudo_align(ref) == ReadMappingType.UNIQUELY_MAPPED
    assert read.mapping.genomes_mapped_to[0]["description"] == "g1"


def test_ambiguous_read_shared_kmers():
    # both genomes contain the read exactly -> all k-mers unspecific
    ref = make_ref(">g1\nACGTACGTCC\n>g2\nACGTACGTGG\n", 4)
    (rec,) = make_reads("@r\nACGTACGT\n+\nIIIIIIII\n")
    read = Read(rec)
    assert read.pseudo_align(ref) == ReadMappingType.AMBIGUOUSLY_MAPPED
    # zero specific k-mers -> empty genome list (reference kmer.py:461)
    assert read.mapping.genomes_mapped_to == []


# g1 owns the read's 4 specific k-mers (AAAA AAAC AACC ACCC); g2 and g3
# share the 9 unspecific S-segment k-mers, so g1 wins on specific counts
# (4 vs 0) but trails on totals (4 vs 9) -> p-validation downgrades.
_DOWNGRADE_FASTA = (
    ">g1\nAAAACCC\n"
    ">g2\nGGGGTTTTACAC\n"
    ">g3\nGGGGTTTTACACGG\n"
)
_DOWNGRADE_READ = "@r\nAAAACCCGGGGTTTTACAC\n+\n" + "I" * 19 + "\n"


def test_downgrade_duplicates_winner():
    ref = make_ref(_DOWNGRADE_FASTA, 4)
    (rec,) = make_reads(_DOWNGRADE_READ)
    read = Read(rec)
    out = read.pseudo_align(ref, m=1, p=1)
    assert out == ReadMappingType.AMBIGUOUSLY_MAPPED
    ids = [g["description"] for g in read.mapping.genomes_mapped_to]
    # downgraded list = [winner] + all with total >= winner's -> winner twice
    assert ids == ["g1", "g1", "g2", "g3"]


def test_downgrade_suppressed_with_large_p():
    ref = make_ref(_DOWNGRADE_FASTA, 4)
    (rec,) = make_reads(_DOWNGRADE_READ)
    read = Read(rec)
    assert read.pseudo_align(ref, m=1, p=50) == ReadMappingType.UNIQUELY_MAPPED


def test_negative_p_skips_validation():
    ref = make_ref(_DOWNGRADE_FASTA, 4)
    (rec,) = make_reads(_DOWNGRADE_READ)
    read = Read(rec)
    assert read.pseudo_align(ref, m=1, p=-1) == ReadMappingType.UNIQUELY_MAPPED


def test_negative_m_raises():
    ref = make_ref(">g1\nAAAA\n", 4)
    (rec,) = make_reads("@r\nAAAA\n+\nIIII\n")
    with pytest.raises(ValueError):
        Read(rec).pseudo_align(ref, m=-1)


def test_quality_filters_exact_counts():
    # read quality: 'I' = 73. MRQ 80 filters whole read.
    ref = make_ref(">g1\nAAAACCCCGGGG\n", 4)
    aln = PseudoAlignment(ref)
    recs = make_reads(
        "@low\nAAAACCCC\n+\nIIIIIIII\n"          # mean 73 < 80 -> filtered
        "@high\nAAAACCCC\n+\nKKKKKKK~\n"          # mean > 80 -> kept
    )
    for r in recs:
        aln.add_read_from_read_record(r, min_read_quality=80)
    s = aln.get_summary()
    assert s["Statistics"]["filtered_quality_reads"] == 1
    assert s["Statistics"]["unique_mapped_reads"] == 1


def test_kmer_quality_filter_counts_occurrences():
    ref = make_ref(">g1\nAAAACCCCGGGG\n", 4)
    aln = PseudoAlignment(ref)
    # one low-quality k-mer window at the start ('!' = 33)
    recs = make_reads("@r\nAAAACCCC\n+\n!!!!~~~~\n")
    aln.add_read_from_read_record(recs[0], min_kmer_quality=60)
    s = aln.get_summary()
    # windows 0..4: sums (33*4), (33*3+126), (33*2+126*2), (33+126*3), (126*4)
    # means: 33, 56.25, 79.5, 102.75, 126 -> 2 windows below 60
    assert s["Statistics"]["filtered_quality_kmers"] == 2


def test_max_genomes_zero_drops_everything():
    ref = make_ref(">g1\nAAAACCCC\n>g2\nGGGGTTTT\n", 4)
    aln = PseudoAlignment(ref)
    recs = make_reads("@r\nAAAACCCC\n+\nIIIIIIII\n")
    aln.add_read_from_read_record(recs[0], max_genomes=0)
    s = aln.get_summary()
    assert s["Statistics"]["unmapped_reads"] == 1
    assert s["Statistics"]["filtered_hr_kmers"] == 5


def test_duplicate_read_id_raises():
    ref = make_ref(">g1\nAAAACCCC\n", 4)
    aln = PseudoAlignment(ref)
    (rec,) = make_reads("@r\nAAAACCCC\n+\nIIIIIIII\n")
    aln.add_read_from_read_record(rec)
    with pytest.raises(AddingExistingRead):
        aln.add_read_from_read_record(rec)


def test_aln_roundtrip(tmp_path):
    ref = make_ref(">g1\nAAAACCCCGGGG\n>g2\nTTTTGGGGCCCC\n", 4)
    aln = PseudoAlignment(ref)
    p = FASTQParser()
    p.parse_records(fastq_of([("AAAACCCC", "IIIIIIII"), ("TTTTGGGG", "IIIIIIII")]))
    aln.align_reads_from_container(list(p))
    path = tmp_path / "out.aln"
    aln.save(str(path))
    loaded = PseudoAlignment.load(str(path))
    assert loaded.get_summary() == aln.get_summary()
    assert loaded.get_reads_by_mapping_type(ReadMappingType.UNIQUELY_MAPPED) == \
        aln.get_reads_by_mapping_type(ReadMappingType.UNIQUELY_MAPPED)


# --- host path vs device path vs oracle ------------------------------------

def _random_case(rng, n_genomes, glen, n_reads, read_len, k):
    genomes = []
    shared = "".join(rng.choice("ACGT") for _ in range(glen))
    for gi in range(n_genomes):
        if gi and rng.random() < 0.4:
            seq = shared[: glen // 2] + "".join(
                rng.choice("ACGT") for _ in range(glen // 2))
        else:
            seq = "".join(rng.choice("ACGT") for _ in range(glen))
        genomes.append((f"g{gi}", seq))
    reads = []
    for _ in range(n_reads):
        if rng.random() < 0.7:
            src = genomes[rng.randrange(n_genomes)][1]
            start = rng.randrange(0, max(len(src) - read_len, 1))
            seq = src[start: start + read_len]
        else:
            seq = "".join(rng.choice("ACGT") for _ in range(read_len))
        if len(seq) < read_len:
            seq += "".join(rng.choice("ACGT") for _ in range(read_len - len(seq)))
        qual = "".join(rng.choice(QUALITY_CHARS) for _ in range(read_len))
        reads.append((seq, qual))
    return genomes, reads


@pytest.mark.parametrize("seed", range(6))
def test_randomized_against_oracle(seed):
    rng = random.Random(seed)
    k = rng.choice([4, 7, 11, 31])
    read_len = rng.choice([33, 47])
    genomes, reads = _random_case(
        rng, n_genomes=rng.choice([2, 4]), glen=90,
        n_reads=25, read_len=read_len, k=k)
    m = rng.choice([0, 1, 2])
    p = rng.choice([-1, 0, 1, 5])
    mrq = rng.choice([None, 70, 85])
    mkq = rng.choice([None, 75])
    mg = rng.choice([None, 1, 2])

    fasta = "".join(f">{n}\n{s}\n" for n, s in genomes)
    fp = FASTAParser(); fp.parse_records(fasta)
    ref = KmerReference(k, list(fp))
    qp = FASTQParser(); qp.parse_records(fastq_of(reads))

    # oracle
    db = build_db(genomes, k)
    results, fr, fk, fh = [], 0, 0, 0
    for seq, qual in reads:
        outcome, glist, nq, nr = align_read(
            db, seq, qual, k, m=m, p=p, min_read_quality=mrq,
            min_kmer_quality=mkq, max_genomes=mg)
        if outcome == "filtered":
            fr += 1
        else:
            fk += nq
            fh += nr
        results.append((outcome, glist))
    expected = summarize(
        genomes, results,
        (mrq is not None, mkq is not None, mg is not None), (fr, fk, fh))

    # device batch path
    aln_dev = PseudoAlignment(ref)
    aln_dev.align_reads_from_container(
        list(qp), m=m, p=p, min_read_quality=mrq,
        min_kmer_quality=mkq, max_genomes=mg, batch_size=8)
    assert aln_dev.get_summary() == expected

    # host single-read path
    aln_host = PseudoAlignment(ref)
    for rec in qp:
        aln_host.add_read_from_read_record(
            rec, m=m, p=p, min_read_quality=mrq,
            min_kmer_quality=mkq, max_genomes=mg)
    assert aln_host.get_summary() == expected


def test_store_superbatch_equals_per_batch_path():
    """The superbatched align-task store path (n >= 8 batches: one
    lax.scan dispatch per 8 sub-batches with stacked store ys) must
    produce the identical summary, read store, and mapping lists as the
    per-batch path."""
    import numpy as np

    from shotgun_tpu.aligner import PseudoAlignment
    from shotgun_tpu.index.build import build_index
    from shotgun_tpu.reference import KmerReference
    from shotgun_tpu.utils.synth import synth_genomes, synth_reads

    rng = np.random.default_rng(17)
    genomes = synth_genomes(rng, 4, 800)
    reads = synth_reads(rng, genomes, 200, 60)
    ref = KmerReference(21, _index=build_index(genomes, 21))

    pa_small = PseudoAlignment(ref)   # 13 batches of 16 -> superbatched
    pa_small.align_packed_reads(reads, 1, 1, batch_size=16,
                                store_reads=True)
    pa_big = PseudoAlignment(ref)     # 1 batch of 256 -> per-batch path
    pa_big.align_packed_reads(reads, 1, 1, batch_size=256,
                              store_reads=True)

    assert pa_small.get_summary() == pa_big.get_summary()
    assert pa_small._read_ids == pa_big._read_ids
    assert pa_small._mtypes == pa_big._mtypes
    assert pa_small._list_counts == pa_big._list_counts
    for a, b in zip(pa_small._list_flat, pa_big._list_flat):
        np.testing.assert_array_equal(a, b)


def test_stream_store_equals_container_store(tmp_path):
    """align_stream(store_reads=True) -- the streamed align task with
    native id extraction -- must produce the identical summary, ids,
    mtypes, and mapping lists as the container store path, including
    with MRQ filtering active."""
    import numpy as np

    from shotgun_tpu.aligner import PseudoAlignment
    from shotgun_tpu.index.build import build_index
    from shotgun_tpu.io.data_file import open_fastq_stream
    from shotgun_tpu.reference import KmerReference
    from shotgun_tpu.utils.synth import synth_genomes, synth_reads, to_fastq

    rng = np.random.default_rng(33)
    genomes = synth_genomes(rng, 4, 900)
    reads = synth_reads(rng, genomes, 300, 60)
    fq = tmp_path / "s.fq"
    fq.write_text(to_fastq(reads))
    ref = KmerReference(21, _index=build_index(genomes, 21))

    for mrq in (None, 60):
        stream = open_fastq_stream(str(fq), lazy=True)
        assert stream is not None
        pa_s = PseudoAlignment(ref)
        pa_s.align_stream(stream, 1, 1, min_read_quality=mrq,
                          batch_size=32, store_reads=True)
        pa_c = PseudoAlignment(ref)
        pa_c.align_packed_reads(reads, 1, 1, min_read_quality=mrq,
                                batch_size=32, store_reads=True)
        assert pa_s.get_summary() == pa_c.get_summary()
        assert pa_s._read_ids == pa_c._read_ids
        assert pa_s._mtypes == pa_c._mtypes
        assert pa_s._list_counts == pa_c._list_counts
        for a, b in zip(pa_s._list_flat, pa_c._list_flat):
            np.testing.assert_array_equal(a, b)


def test_auto_batch_size_resolution(tmp_path):
    """batch_size=0 (the CLI default) resolves by input size and is
    output-invariant vs an explicit batch size."""
    import numpy as np

    from shotgun_tpu.aligner import PseudoAlignment, _auto_batch
    from shotgun_tpu.index.build import build_index
    from shotgun_tpu.io.data_file import open_fastq_stream
    from shotgun_tpu.reference import KmerReference
    from shotgun_tpu.utils.synth import synth_genomes, synth_reads, to_fastq

    assert _auto_batch(0) == 2048
    assert _auto_batch(131_071) == 2048
    assert _auto_batch(131_072) == 32768

    rng = np.random.default_rng(44)
    genomes = synth_genomes(rng, 3, 800)
    reads = synth_reads(rng, genomes, 200, 60)
    fq = tmp_path / "a.fq"
    fq.write_text(to_fastq(reads))
    ref = KmerReference(21, _index=build_index(genomes, 21))

    pa_auto = PseudoAlignment(ref)
    pa_auto.align_stream(open_fastq_stream(str(fq), lazy=True), 1, 1,
                         batch_size=0)
    pa_fixed = PseudoAlignment(ref)
    pa_fixed.align_stream(open_fastq_stream(str(fq), lazy=True), 1, 1,
                          batch_size=64)
    assert pa_auto.get_summary() == pa_fixed.get_summary()

    pa_packed = PseudoAlignment(ref)
    pa_packed.align_packed_reads(reads, 1, 1, batch_size=0,
                                 store_reads=False)
    assert pa_packed.get_summary() == pa_fixed.get_summary()
