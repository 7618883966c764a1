"""Device-side index build vs the host builder: exact equality of the
align-relevant structures (sorted keys, genome counts, set membership,
first-seen order) on randomized corpora including N runs, short records,
and duplicate genomes."""

import numpy as np
import pytest

from shotgun_tpu.index.build import build_index
from shotgun_tpu.index.device_build import device_build_tables
from shotgun_tpu.io.packing import pack_genomes
from shotgun_tpu.io.records import SeqRecord
from shotgun_tpu.reference import KmerReference
from shotgun_tpu.utils.synth import synth_genomes, synth_reads


def _genomes_from_strings(seqs):
    recs = [
        SeqRecord([("description", f"g{i}"), ("genome", s)])
        for i, s in enumerate(seqs)
    ]
    return pack_genomes(recs)


def _check_equal(genomes, k):
    host = build_index(genomes, k)
    dev = device_build_tables(genomes, k, KmerReference._pad_rows)
    assert dev is not None
    u = dev["num_kmers"]
    assert u == host.num_kmers

    klo = np.asarray(dev["klo"])[:u]
    khi = np.asarray(dev["khi"])[:u]
    np.testing.assert_array_equal(klo, host.kmer_lo)
    np.testing.assert_array_equal(khi, host.kmer_hi)

    # genome counts per key
    np.testing.assert_array_equal(
        np.asarray(dev["gc"])[:u], host.genome_counts())

    # set membership: the device's per-key mask must equal the host's
    sid_d = np.asarray(dev["sid"])[:u]
    masks_d = dev["set_masks"]
    host_masks = np.zeros((host.num_sets, 8), dtype=np.uint8)
    host_masks[:, : host.set_masks.shape[1]] = host.set_masks
    np.testing.assert_array_equal(
        masks_d[sid_d], host_masks[host.set_id])

    # first-seen global scan order must reproduce the reference's dict
    # insertion order (argsort equality, not raw indices: the device
    # counts windows over the padded concatenated plane)
    fs_d = np.asarray(dev["first_seen"])[:u]
    np.testing.assert_array_equal(
        np.argsort(fs_d, kind="stable"),
        np.argsort(host.first_seen, kind="stable"))


def test_device_build_matches_host_synthetic():
    rng = np.random.default_rng(0)
    genomes = synth_genomes(rng, 5, 3_000)
    _check_equal(genomes, 31)


def test_device_build_small_k():
    rng = np.random.default_rng(1)
    genomes = synth_genomes(rng, 3, 500)
    _check_equal(genomes, 11)


def test_device_build_with_ns_and_short_records():
    seqs = [
        "ACGTACGTACGTNNACGTACGTACGTACGT",
        "TTT",  # shorter than k -> contributes nothing at k=11
        "ACGTACGTACGTACGTACGTACGTACGTACGT",
        "NNNNNNNNNNNNNNNN",
        "ACGTACGTACGTACGT" * 4,
    ]
    _check_equal(_genomes_from_strings(seqs), 11)


def test_device_build_duplicate_genomes_share_sets():
    seqs = ["ACGTACGTACGTACGTACGTACG"] * 3 + ["TTTTTTTTTTTTTTTTTTTTTTT"]
    _check_equal(_genomes_from_strings(seqs), 21)


def test_device_build_rejects_unsupported():
    rng = np.random.default_rng(2)
    genomes = synth_genomes(rng, 2, 400)
    assert device_build_tables(genomes, 75, KmerReference._pad_rows) is None


def test_device_build_align_summary_matches():
    """End-to-end: aligning against a device-built reference produces the
    identical dumpalign summary as the host-built one."""
    from shotgun_tpu.aligner import PseudoAlignment

    rng = np.random.default_rng(3)
    genomes = synth_genomes(rng, 4, 2_000)
    reads = synth_reads(rng, genomes, 256, 100)

    ref_host = KmerReference(31, _index=build_index(genomes, 31))
    pa_host = PseudoAlignment(ref_host)
    pa_host.align_packed_reads(reads, 1, 1, store_reads=False)

    ref_dev = KmerReference.from_device_build(genomes, 31)
    assert ref_dev is not None
    pa_dev = PseudoAlignment(ref_dev)
    pa_dev.align_packed_reads(reads, 1, 1, store_reads=False)

    assert pa_host.get_summary() == pa_dev.get_summary()
