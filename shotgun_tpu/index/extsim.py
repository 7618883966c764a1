"""EXTSIM: greedy filtering of highly-similar genomes.

Array-native reimplementation of the reference pipeline
(reference kmer.py:152-263): per-identifier k-mer sets, ascending sort by
(unique_kmers, total_kmers, genome_length, order), greedy keep-first scan
with overlap-coefficient similarity |A∩B| / min(|A|, |B|), strict ``>``
threshold comparison, and a ``similarity_info`` report in processed order.

Identifier semantics are preserved exactly: records sharing a description
merge their k-mer sets, and the *last* such record defines genome_length
and sort order (dict-overwrite behavior, reference kmer.py:164-176).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from shotgun_tpu.index.build import KmerIndex, filter_records


def _kmer_sets_by_identifier(index: KmerIndex) -> Dict[str, np.ndarray]:
    """identifier -> sorted array of distinct k-mer ids (merged records)."""
    kmer_of_occ = np.repeat(
        np.arange(index.num_kmers, dtype=np.int64), np.diff(index.post_offsets)
    )
    ident_of_rec = {}
    ident_idx = np.empty(index.num_records, dtype=np.int64)
    idents: List[str] = []
    for rec, desc in enumerate(index.descriptions):
        if desc not in ident_of_rec:
            ident_of_rec[desc] = len(idents)
            idents.append(desc)
        ident_idx[rec] = ident_of_rec[desc]

    pairs = np.unique(
        kmer_of_occ * len(idents) + ident_idx[index.post_record]
    )
    sets: Dict[str, np.ndarray] = {}
    ids_of_pair = pairs % len(idents)
    kmers_of_pair = pairs // len(idents)
    for i, ident in enumerate(idents):
        sets[ident] = np.sort(kmers_of_pair[ids_of_pair == i])
    return sets


def apply_similarity_filter(index: KmerIndex, threshold: float) -> KmerIndex:
    """Run the full EXTSIM pipeline; returns a filtered index with
    ``similarity_info`` populated."""
    sets = _kmer_sets_by_identifier(index)
    record_count = index.genome_counts()  # distinct records per k-mer
    unique_kmer = record_count == 1

    # per-identifier stats; last record with an identifier wins for
    # genome_length and order (reference kmer.py:165-176)
    stats: Dict[str, Tuple[int, int, int, int]] = {}
    for order, desc in enumerate(index.descriptions):
        kset = sets.get(desc, np.zeros(0, dtype=np.int64))
        total = int(kset.size)
        unique = int(unique_kmer[kset].sum()) if kset.size else 0
        length = int(index.record_lengths[order])
        stats[desc] = (unique, total, length, order)

    processed = sorted(stats.items(), key=lambda item: item[1])

    kept: List[Tuple[str, np.ndarray]] = []
    similarity_info: Dict[str, Dict[str, object]] = {}
    for ident, (unique, total, length, _order) in processed:
        cur = sets.get(ident, np.zeros(0, dtype=np.int64))
        verdict = None
        for kept_ident, kept_set in kept:
            denom = min(cur.size, kept_set.size)
            if denom > 0:
                inter = np.intersect1d(cur, kept_set, assume_unique=True).size
                score = inter / denom
            else:
                score = 0
            if score > threshold:
                verdict = (kept_ident, score)
                break
        if verdict is None:
            similarity_info[ident] = {
                "kept": "yes",
                "unique_kmers": unique,
                "total_kmers": total,
                "genome_length": length,
                "similar_to": "NA",
                "similarity_score": "NA",
            }
            kept.append((ident, cur))
        else:
            similarity_info[ident] = {
                "kept": "no",
                "unique_kmers": unique,
                "total_kmers": total,
                "genome_length": length,
                "similar_to": verdict[0],
                "similarity_score": verdict[1],
            }

    kept_ids = {ident for ident, info in similarity_info.items() if info["kept"] == "yes"}
    kept_records = np.asarray(
        [r for r, desc in enumerate(index.descriptions) if desc in kept_ids],
        dtype=np.int64,
    )
    out = filter_records(index, kept_records)
    out.similarity_info = similarity_info
    return out
