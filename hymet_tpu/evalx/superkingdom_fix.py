"""Superkingdom-taxid canonicalization: port of reference
``bench/tools/fix_superkingdom_taxids.py``.

GTDB-derived converters emit Bacillati/Pseudomonadati (1783272/3379134)
superkingdoms while CAMI truth uses NCBI Bacteria (2). This rebuilds a
predicted profile's superkingdom rows by aggregating the highest
available lower rank upward to the truth profile's superkingdom ids
(``fix_superkingdom_taxids.py:89-165``), rewriting the file in place.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Set, Tuple

RANK_PRIORITY = ["phylum", "class", "order", "family", "genus", "species"]

CANONICAL_SUPERKINGDOMS = {"2", "2157", "2759", "10239", "12884"}


def load_taxonomy_table(path: str) -> Dict[str, Tuple[str, str, str]]:
    """TaxID -> (parent, rank, name) from taxonomy_hierarchy.tsv."""
    out: Dict[str, Tuple[str, str, str]] = {}
    with open(path, encoding="utf-8", errors="ignore") as f:
        header = f.readline().rstrip("\r\n").split("\t")
        idx = {c: i for i, c in enumerate(header)}
        for line in f:
            row = line.rstrip("\r\n").split("\t")
            if len(row) < 4:
                continue
            tid = row[idx.get("TaxID", 0)]
            out[tid] = (
                row[idx.get("ParentTaxID", 3)],
                row[idx.get("Rank", 2)].lower(),
                row[idx.get("Name", 1)],
            )
    return out


def canonical_superkingdom(
    taxid: str, taxonomy: Dict[str, Tuple[str, str, str]]
) -> str:
    current = taxid
    visited = set()
    while current and current not in visited:
        visited.add(current)
        if current in CANONICAL_SUPERKINGDOMS:
            return current
        parent, _, _ = taxonomy.get(current, ("", "", ""))
        if not parent or parent == current:
            break
        current = parent
    return taxid


def align_to_targets(
    taxid: str, targets: Set[str], taxonomy: Dict[str, Tuple[str, str, str]]
) -> Optional[str]:
    current = taxid
    visited = set()
    while current and current not in visited:
        visited.add(current)
        if current in targets:
            return current
        parent, _, _ = taxonomy.get(current, ("", "", ""))
        if not parent or parent == current:
            break
        current = parent
    return None


def load_truth_superkingdoms(path: str) -> Set[str]:
    targets: Set[str] = set()
    with open(path, encoding="utf-8", errors="ignore") as f:
        for line in f:
            if line.startswith(("@", "#")):
                continue
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 2 and parts[1].lower() == "superkingdom":
                targets.add(parts[0])
    return targets


def fix_superkingdom(
    profile_path: str,
    truth_profile_path: str,
    taxonomy_hierarchy_tsv: str,
) -> None:
    """Rewrite `profile_path` in place."""
    if not os.path.exists(profile_path):
        return
    taxonomy = load_taxonomy_table(taxonomy_hierarchy_tsv)
    targets = load_truth_superkingdoms(truth_profile_path)
    targets = targets or set(CANONICAL_SUPERKINGDOMS)

    with open(profile_path, encoding="utf-8", errors="ignore") as f:
        lines = f.readlines()
    if not lines:
        return
    header_lines = [ln for ln in lines if ln.startswith(("@", "#"))]
    body = [
        ln.rstrip("\n").split("\t")
        for ln in lines
        if not ln.startswith(("@", "#"))
    ]
    if not body:
        return

    original_super = [
        row for row in body if len(row) >= 2 and row[1].lower() == "superkingdom"
    ]
    available = {
        row[1].lower()
        for row in body
        if len(row) >= 2 and row[1].lower() != "superkingdom"
    }
    agg_rank = next((r for r in RANK_PRIORITY if r in available), None)

    remainder: List[List[str]] = []
    aggregates: Dict[str, float] = {}
    for row in body:
        if len(row) < 5:
            continue
        taxid, rank = row[0], row[1].lower()
        if rank == "superkingdom":
            continue
        remainder.append(row)
        if agg_rank and rank != agg_rank:
            continue
        try:
            perc = float(row[4])
        except ValueError:
            perc = 0.0
        target = align_to_targets(taxid, targets, taxonomy)
        if not target:
            target = canonical_superkingdom(taxid, taxonomy)
        aggregates[target] = aggregates.get(target, 0.0) + perc

    for t in targets:
        aggregates.setdefault(t, 0.0)

    super_rows: List[List[str]] = []
    if aggregates:
        for taxid, perc in sorted(aggregates.items()):
            if perc <= 0:
                continue
            _, _, name = taxonomy.get(taxid, ("", "", ""))
            width = 7
            path = [taxid] + ["NA"] * (width - 1)
            names = [name or "NA"] + ["NA"] * (width - 1)
            super_rows.append(
                [taxid, "superkingdom", "|".join(path), "|".join(names), f"{perc:.6f}"]
            )
        existing = {row[0] for row in super_rows}
        for row in original_super:
            if row[0] not in existing:
                super_rows.append(row)
    else:
        super_rows = original_super

    with open(profile_path, "w", encoding="utf-8") as f:
        f.writelines(header_lines)
        for row in super_rows + remainder:
            f.write("\t".join(row) + "\n")
