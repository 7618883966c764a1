"""Synthetic benchmark data: random genomes + reads sampled from them.

Generates packed arrays directly (no string round-trip) for throughput
benchmarking, and can also emit FASTA/FASTQ text for end-to-end runs.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from shotgun_tpu.io.packing import GenomeArrays, ReadBatch

_BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def synth_genomes(
    rng: np.random.Generator, n_genomes: int, length: int
) -> GenomeArrays:
    codes = rng.integers(0, 4, size=n_genomes * length, dtype=np.uint8)
    offsets = np.arange(n_genomes + 1, dtype=np.int64) * length
    descriptions = [f"genome_{i}" for i in range(n_genomes)]
    return GenomeArrays(descriptions=descriptions, codes=codes, offsets=offsets)


def synth_reads(
    rng: np.random.Generator,
    genomes: GenomeArrays,
    n_reads: int,
    read_len: int,
    quality_char: str = "I",
) -> ReadBatch:
    """Error-free reads sampled uniformly from the genomes."""
    n_genomes = genomes.num_records
    length = genomes.record_length(0)
    gi = rng.integers(0, n_genomes, size=n_reads)
    start = rng.integers(0, length - read_len + 1, size=n_reads)
    abs_start = genomes.offsets[gi] + start
    idx = abs_start[:, None] + np.arange(read_len, dtype=np.int64)[None, :]
    codes = genomes.codes[idx]
    qual = np.full((n_reads, read_len), ord(quality_char), dtype=np.uint8)
    lengths = np.full(n_reads, read_len, dtype=np.int32)
    ids = [f"read_{i}" for i in range(n_reads)]
    return ReadBatch(ids=ids, codes=codes, qual=qual, lengths=lengths)


def to_fasta(genomes: GenomeArrays) -> str:
    lines: List[str] = []
    for i, desc in enumerate(genomes.descriptions):
        lines.append(f">{desc}")
        seq = _BASES[genomes.record_codes(i) % 4].tobytes().decode("ascii")
        for j in range(0, len(seq), 80):
            lines.append(seq[j: j + 80])
    return "\n".join(lines) + "\n"


def to_fastq(reads: ReadBatch) -> str:
    lines: List[str] = []
    for i, rid in enumerate(reads.ids):
        li = int(reads.lengths[i])
        seq = _BASES[reads.codes[i, :li] % 4].tobytes().decode("ascii")
        qual = reads.qual[i, :li].tobytes().decode("ascii")
        lines += [f"@{rid}", seq, "+", qual]
    return "\n".join(lines) + "\n"
