"""Independent pure-Python model of the pseudo-alignment semantics.

Written directly from the behavioral spec (SURVEY.md §2/§3) with plain
dicts and strings; deliberately simple and slow.  Tests compare the
engine's device and host paths against this model on randomized inputs.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple


def build_db(genomes: List[Tuple[str, str]], k: int):
    """genomes: list of (description, sequence).  Returns db:
    kmer -> {record_index -> sorted positions}, in first-seen order."""
    db: Dict[str, Dict[int, List[int]]] = {}
    for gi, (_, seq) in enumerate(genomes):
        if k <= 0 or k > len(seq):
            continue
        for pos in range(len(seq) - k + 1):
            km = seq[pos: pos + k]
            if "N" in km:
                continue
            db.setdefault(km, {}).setdefault(gi, []).append(pos)
    return db


def align_read(
    db,
    seq: str,
    qual: str,
    k: int,
    m: int = 1,
    p: int = 1,
    min_read_quality: Optional[int] = None,
    min_kmer_quality: Optional[int] = None,
    max_genomes: Optional[int] = None,
):
    """Returns (outcome, genome_list, n_quality_filtered, n_redundant).

    outcome: 'filtered' | 'unmapped' | 'unique' | 'ambiguous'.
    genome_list: record indices in output-list order (with the downgrade
    double-count quirk preserved)."""
    if min_read_quality is not None:
        if sum(map(ord, qual)) / len(qual) < min_read_quality:
            return "filtered", [], 0, 0

    n_qual = 0
    n_red = 0
    stored: Dict[str, Dict[int, List[int]]] = {}
    for start in range(max(len(seq) - k + 1, 0)):
        km = seq[start: start + k]
        if min_kmer_quality is not None:
            if sum(map(ord, qual[start: start + k])) / k < min_kmer_quality:
                n_qual += 1
                continue
        refs = db.get(km)
        if not refs:
            continue
        if max_genomes is not None and len(refs) > max_genomes:
            n_red += 1
            continue
        stored[km] = refs
    if not stored:
        return "unmapped", [], n_qual, n_red

    def counts(specific_only: bool) -> Dict[int, int]:
        out: Dict[int, int] = {}
        for km, refs in stored.items():
            if specific_only and len(refs) != 1:
                continue
            for gi in refs:
                out[gi] = out.get(gi, 0) + 1
        return out

    spec = counts(specific_only=True)
    unique_winner = None
    if len(spec) == 1:
        unique_winner = next(iter(spec))
    elif len(spec) > 1:
        ranked = sorted(spec, key=lambda g: spec[g], reverse=True)
        if spec[ranked[0]] >= spec[ranked[1]] + m:
            unique_winner = ranked[0]
    if unique_winner is None:
        return "ambiguous", list(spec.keys()), n_qual, n_red

    if p >= 0:
        total = counts(specific_only=False)
        mine = total.get(unique_winner, 0)
        if max(total.values(), default=0) - mine > p:
            genome_list = [unique_winner] + [
                g for g, c in total.items() if c >= mine
            ]
            return "ambiguous", genome_list, n_qual, n_red
    return "unique", [unique_winner], n_qual, n_red


def summarize(
    genomes: List[Tuple[str, str]],
    results,
    flags: Tuple[bool, bool, bool],
    filtered_counts: Tuple[int, int, int],
):
    """Fold per-read results into the dumpalign summary structure."""
    stats = {
        "unique_mapped_reads": 0,
        "ambiguous_mapped_reads": 0,
        "unmapped_reads": 0,
    }
    has_mrq, has_mkq, has_mg = flags
    if has_mrq:
        stats["filtered_quality_reads"] = filtered_counts[0]
    if has_mkq:
        stats["filtered_quality_kmers"] = filtered_counts[1]
    if has_mg:
        stats["filtered_hr_kmers"] = filtered_counts[2]
    genome_mapping: Dict[str, Dict[str, int]] = {}
    for outcome, genome_list in results:
        if outcome == "filtered":
            continue
        if outcome == "unmapped":
            stats["unmapped_reads"] += 1
            continue
        key = "unique_reads" if outcome == "unique" else "ambiguous_reads"
        stats[
            "unique_mapped_reads" if outcome == "unique" else "ambiguous_mapped_reads"
        ] += 1
        for gi in genome_list:
            ident = genomes[gi][0]
            genome_mapping.setdefault(
                ident, {"unique_reads": 0, "ambiguous_reads": 0}
            )[key] += 1
    return {"Statistics": stats, "Summary": genome_mapping}
