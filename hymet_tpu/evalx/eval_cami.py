"""CAMI evaluator: profile + per-contig metrics.

Port of reference ``tools/eval_cami.py`` with identical metrics and output
files (profile_summary.tsv, contigs_exact.tsv, contigs_per_rank.tsv,
_debug_info.txt):

- per-rank L1 total variation (0.5 * sum |a-b|), Bray-Curtis %, and
  presence/absence P/R/F1 at a 0.1% threshold (``eval_cami.py:369-385``),
- robust multi-format profile parser (CAMI rows / taxid+rank+percentage
  headers / taxpath(sn) headers, ``:168-234``),
- robust truth-contig parser (tsv/csv/whitespace, header aliases,
  ``:243-303``),
- length-weighted profile rebuild from per-contig labels (``:306-329``),
- prediction-taxid resolution cascade: deepest lineage name -> TaxID
  column -> Target id-map -> PAF first hit (``:388-483``),
- contig pairing cascade: name match -> MD5-of-sequence -> best-hit remap
  with cov/id >= 0.95 (``:499-528``) — the last leg uses our minimizer
  aligner instead of a minimap2 subprocess.

All taxonkit subprocess calls are TaxonomyDB lookups. Reference quirks
are preserved for byte parity: rank-truncated lineages accumulate an
empty-string taxon in rebuilt profiles (``eval_cami.py:322-324``) and
count as incorrect (not excluded) rows in per-rank contig accuracy
(``:544``) — arguably bugs, but the evaluator must report the same
numbers as the reference's own evaluator on the same inputs
(oracle: tests/test_eval_oracle.py::test_profile_rebuild_byte_parity).
"""

from __future__ import annotations

import collections
import csv
import hashlib
import os
import pathlib
import re
from typing import Dict, List, Optional, Sequence, Tuple

from hymet_tpu.evalx.cami import parse_lineage_cami
from hymet_tpu.taxonomy.db import TaxonomyDB
from hymet_tpu.taxonomy.idmap import IdentifierMap

RANKS = ["superkingdom", "phylum", "class", "order", "family", "genus", "species"]

# note: strain/subspecies collapse to species here (eval granularity),
# unlike the classifier's 8-rank table — mirrors eval_cami.py:19-40.
_EVAL_ALIAS = {
    "domain": "superkingdom",
    "kingdom": "superkingdom",
    "sk": "superkingdom",
    "k": "superkingdom",
    "superkingdom": "superkingdom",
    "phylum": "phylum",
    "p": "phylum",
    "class": "class",
    "c": "class",
    "order": "order",
    "o": "order",
    "family": "family",
    "f": "family",
    "genus": "genus",
    "g": "genus",
    "species": "species",
    "s": "species",
    "subspecies": "species",
    "ss": "species",
    "strain": "species",
}


def is_num(s: Optional[str]) -> bool:
    s = (s or "").strip()
    if not s:
        return False
    return bool(re.fullmatch(r"[0-9]+(?:\.[0-9]+)?", s))


def normalize_taxid(val: str) -> str:
    if not val:
        return ""
    match = re.search(r"[0-9]+", val)
    return match.group(0) if match else ""


def parse_lineage_eval(lineage_raw: str) -> Dict[str, str]:
    out: Dict[str, str] = {}
    if not lineage_raw:
        return out
    for part in (seg.strip() for seg in lineage_raw.split(";")):
        if not part or ":" not in part:
            continue
        rk, nm = part.split(":", 1)
        rank = _EVAL_ALIAS.get(rk.strip().lower())
        nm = nm.strip()
        if rank and nm:
            out[rank] = nm
    return out


# ----------------------------------------------------------------------
# profiles


def _empty_profile() -> Dict[str, collections.Counter]:
    return {r: collections.Counter() for r in RANKS}


def parse_profile_lines(lines: Sequence[str], taxdb: Optional[TaxonomyDB]) -> Dict[str, collections.Counter]:
    prof = _empty_profile()
    ok = False
    for ln in lines:
        if not ln.strip() or ln[0] in "#@":
            continue
        ps = ln.rstrip("\n").split("\t")
        if len(ps) >= 5 and is_num(ps[0]):
            rk = ps[1].strip().lower()
            if rk in prof:
                try:
                    prof[rk][ps[0]] += float(ps[4])
                    ok = True
                except ValueError:
                    pass
            continue
        break
    if ok:
        return prof

    body = [ln for ln in lines if ln.strip() and ln[0] not in "#@"]
    rdr = csv.reader(body, delimiter="\t")
    try:
        hdr = next(rdr)
    except StopIteration:
        return prof
    h = [c.strip().lower() for c in hdr]

    def idx(*names):
        for n in names:
            if n in h:
                return h.index(n)
        return -1

    i_taxid = idx("taxid", "taxon_id", "ncbi_taxid", "ncbi_tax_id")
    i_rank = idx("rank")
    i_perc = idx("percentage", "abundance", "rel_abundance", "fraction_total_reads")
    i_taxpath = idx("taxpath")
    i_taxpathsn = idx("taxpathsn", "taxpath_sn", "taxpath_names", "lineage")
    rows = list(rdr)
    if i_taxid >= 0 and i_rank >= 0 and i_perc >= 0:
        mul = 100.0 if ("abundance" in h[i_perc] or "fraction" in h[i_perc]) else 1.0
        for ps in rows:
            try:
                tid = normalize_taxid(ps[i_taxid])
                rk = ps[i_rank].strip().lower()
                val = float(ps[i_perc]) * mul
                if rk in prof and tid:
                    prof[rk][tid] += val
            except (ValueError, IndexError):
                pass
        return prof
    if i_rank >= 0 and (i_taxpath >= 0 or i_taxpathsn >= 0) and i_perc >= 0:
        rk_to_idx = dict(zip(RANKS, range(len(RANKS))))
        mul = 100.0 if ("abundance" in h[i_perc] or "fraction" in h[i_perc]) else 1.0
        if i_taxpath >= 0:
            for ps in rows:
                try:
                    rk = ps[i_rank].strip().lower()
                    ids = [x for x in ps[i_taxpath].strip().split("|") if x and x != "NA"]
                    r_i = rk_to_idx.get(rk, -1)
                    if 0 <= r_i < len(ids):
                        prof[rk][ids[r_i]] += float(ps[i_perc]) * mul
                except (ValueError, IndexError):
                    pass
            return prof
        # taxpathsn (names) path: resolve rank names to taxids
        names = set()
        keep = []
        for ps in rows:
            try:
                rk = ps[i_rank].strip().lower()
                pathn = [p.strip() for p in ps[i_taxpathsn].split("|")]
                r_i = rk_to_idx.get(rk, -1)
                if 0 <= r_i < len(pathn) and pathn[r_i]:
                    names.add(pathn[r_i])
                keep.append(ps)
            except (ValueError, IndexError):
                pass
        m = taxdb.batch_name2taxid(names) if taxdb else {}
        for ps in keep:
            try:
                rk = ps[i_rank].strip().lower()
                pathn = [p.strip() for p in ps[i_taxpathsn].split("|")]
                r_i = rk_to_idx.get(rk, -1)
                if 0 <= r_i < len(pathn):
                    tid = m.get(pathn[r_i])
                    if tid:
                        prof[rk][tid] += float(ps[i_perc]) * mul
            except (ValueError, IndexError):
                pass
    return prof


def load_profile_any(path: Optional[str], taxdb: Optional[TaxonomyDB]) -> Dict[str, collections.Counter]:
    if not path or not os.path.isfile(path):
        return _empty_profile()
    with open(path, encoding="utf-8", errors="ignore") as f:
        return parse_profile_lines(f.readlines(), taxdb)


# ----------------------------------------------------------------------
# truth contigs


def load_gt_contigs(gt_file: Optional[str]) -> Dict[str, str]:
    out: Dict[str, str] = {}
    if not gt_file or not os.path.isfile(gt_file):
        return out
    with open(gt_file, encoding="utf-8", errors="ignore") as fh:
        first_line = fh.readline()
    if "\t" in first_line:
        delim = "\t"
    elif "," in first_line:
        delim = ","
    else:
        delim = None
    with open(gt_file, encoding="utf-8", errors="ignore") as f:
        if delim:
            rdr = csv.reader(f, delimiter=delim)
            hdr = next(rdr)
            rows = [row for row in rdr if row]
        else:
            hdr = first_line.strip().split()
            rows = []
            next(f)
            for line in f:
                line = line.strip()
                if line:
                    rows.append(line.split())
    h = [c.strip().lstrip("#").lower() for c in hdr]
    contig_keys = [k for k in h if any(x in k for x in ("contig", "sequence", "scaffold"))]
    taxid_keys = [k for k in h if ("tax" in k and "path" not in k)] + [
        k
        for k in h
        if k in ("ncbi_taxid", "ncbi_tax_id", "taxid", "tax_id", "species_taxid", "genome_taxid")
    ]
    ci = h.index(contig_keys[0]) if contig_keys else 0
    ti = h.index(taxid_keys[0]) if taxid_keys else -1
    if ti >= 0:
        for ps in rows:
            if len(ps) <= max(ci, ti):
                continue
            raw = (ps[ti] or "").strip()
            if not raw:
                continue
            ntid = raw if is_num(raw) else normalize_taxid(raw)
            if ntid:
                out[ps[ci]] = normalize_taxid(ntid)
    else:
        if "taxpath" in h:
            tpi = h.index("taxpath")
            for ps in rows:
                ids = [x for x in ps[tpi].split("|") if x and x != "NA"]
                if ids:
                    tid = normalize_taxid(ids[-1])
                    if tid:
                        out[ps[ci]] = tid
        else:
            for ps in rows:
                for x in ps[1:]:
                    if is_num(x):
                        out[ps[0]] = normalize_taxid(x)
                        break
    return out


# ----------------------------------------------------------------------
# fasta helpers


def fasta_lengths(paths: Sequence[Optional[str]]) -> Dict[str, int]:
    lens: Dict[str, int] = {}
    for path in paths:
        if not path or not os.path.isfile(path):
            continue
        from hymet_tpu.io.fasta import iter_fasta

        for name, seq in iter_fasta(path):
            lens.setdefault(name, len(seq))
    return lens


def fasta_hashes(path: Optional[str]) -> Dict[str, str]:
    hmap: Dict[str, str] = {}
    if not path or not os.path.isfile(path):
        return hmap
    from hymet_tpu.io.fasta import iter_fasta

    for name, seq in iter_fasta(path):
        hmap[name] = hashlib.md5(seq).hexdigest()
    return hmap


# ----------------------------------------------------------------------
# metrics


def l1_and_braycurtis(a: dict, b: dict) -> Tuple[float, float]:
    keys = set(a) | set(b)
    if not keys:
        # an empty rank scores BC=100 in the reference's profile_summary
        # (eval_cami.py:611-620 computes inline without the early return
        # its own standalone helper at :369-377 has)
        return 0.0, 100.0
    sum_abs = sum(abs(a.get(k, 0.0) - b.get(k, 0.0)) for k in keys)
    l1 = 0.5 * sum_abs
    sump = sum(a.get(k, 0.0) for k in keys)
    sumt = sum(b.get(k, 0.0) for k in keys)
    shared = sum(min(a.get(k, 0.0), b.get(k, 0.0)) for k in keys)
    bc = 1.0 - (2.0 * shared / (sump + sumt if (sump + sumt) > 0 else 1.0))
    return l1, bc * 100.0


def prf_presence(a: dict, b: dict, thr: float = 0.1):
    A = {k for k, v in a.items() if v >= thr}
    B = {k for k, v in b.items() if v >= thr}
    tp = len(A & B)
    fp = len(A - B)
    fn = len(B - A)
    prec = tp / (tp + fp) if (tp + fp) > 0 else 0.0
    rec = tp / (tp + fn) if (tp + fn) > 0 else 0.0
    f1 = 2 * prec * rec / (prec + rec) if (prec + rec) > 0 else 0.0
    return prec * 100.0, rec * 100.0, f1 * 100.0, tp, fp, fn


# ----------------------------------------------------------------------
# prediction taxids


def paf_firsthit_q2t(paf_path: Optional[str]) -> Dict[str, str]:
    q2t: Dict[str, str] = {}
    if not paf_path or not os.path.isfile(paf_path):
        return q2t
    with open(paf_path, encoding="utf-8", errors="ignore") as f:
        for ln in f:
            if not ln.strip() or ln[0] == "#":
                continue
            p = ln.rstrip("\n").split("\t")
            if len(p) < 6:
                continue
            q2t.setdefault(p[0], p[5])
    return q2t


def preds_taxid_from_classified(
    classified_tsv: Optional[str],
    taxdb: TaxonomyDB,
    idmap: Optional[IdentifierMap],
    paf_path: Optional[str],
) -> Dict[str, str]:
    """Resolution cascade of ``eval_cami.py:388-483``."""
    cont2tid: Dict[str, str] = {}
    lineage_records: Dict[str, Dict[str, str]] = {}
    fallback_info: Dict[str, Dict[str, Optional[str]]] = {}
    all_names: set = set()

    if classified_tsv and os.path.isfile(classified_tsv):
        with open(classified_tsv, encoding="utf-8", errors="ignore") as f:
            reader = csv.DictReader(f, delimiter="\t")
            raw_fields = reader.fieldnames or []
            headers = [(h or "").strip().lower() for h in raw_fields]

            def key(*names):
                for n in names:
                    if n in headers:
                        return raw_fields[headers.index(n)]
                return None

            key_query = key("query", "qname", "q")
            key_taxid = key("taxid")
            key_target = key("target", "tname")
            key_lineage = key("lineage")
            for row in reader:
                q = row.get(key_query) if key_query else None
                if not q:
                    continue
                lineage = parse_lineage_eval(row.get(key_lineage, "") if key_lineage else "")
                if lineage:
                    lineage_records[q] = lineage
                    all_names.update(nm for nm in lineage.values() if nm)
                fallback_info[q] = {
                    "taxid": row.get(key_taxid) if key_taxid else None,
                    "target": row.get(key_target) if key_target else None,
                }

    name_map = taxdb.batch_name2taxid(all_names) if all_names else {}

    for q, lineage in lineage_records.items():
        for rank in reversed(RANKS):
            nm = lineage.get(rank)
            if not nm:
                continue
            tid = name_map.get(nm)
            if tid and normalize_taxid(tid):
                cont2tid[q] = normalize_taxid(tid)
                break

    for q, info in fallback_info.items():
        if q in cont2tid:
            continue
        ntid = normalize_taxid(info.get("taxid") or "")
        if ntid:
            cont2tid[q] = ntid

    def try_target(q: str, target: str) -> None:
        if not idmap:
            return
        base = target.split("|", 1)[0]
        candidates = [target, base]
        if "." in base:
            candidates.append(base.split(".", 1)[0])
        for cand in candidates:
            tid = idmap.get(cand)
            if tid and normalize_taxid(tid):
                cont2tid[q] = normalize_taxid(tid)
                return

    for q, info in fallback_info.items():
        if q in cont2tid:
            continue
        target = (info.get("target") or "").strip()
        if target:
            try_target(q, target)

    for q, target in paf_firsthit_q2t(paf_path).items():
        if q not in cont2tid:
            try_target(q, target)

    return cont2tid


# ----------------------------------------------------------------------
# length-weighted profile rebuild


def profiles_from_contig_maps(
    contig2tid: Dict[str, str], lengths: Dict[str, int], taxdb: TaxonomyDB
) -> Dict[str, collections.Counter]:
    prof = _empty_profile()
    normalized = {c: normalize_taxid(t) for c, t in contig2tid.items() if normalize_taxid(t)}
    if not normalized:
        return prof
    paths = {tid: taxdb.taxpath(tid) for tid in set(normalized.values())}
    acc = collections.Counter()
    for cont, tid in normalized.items():
        w = lengths.get(cont, 1)
        ids = paths[tid][0].split("|")
        for i, r in enumerate(RANKS):
            # reference quirk preserved: empty (rank-truncated) slots
            # accumulate under the "" key (eval_cami.py:322-324), so a
            # genus-level call still contributes "unassigned" mass at
            # species rank and "" can match "" in presence P/R/F1
            if i < len(ids) and ids[i] != "NA":
                prof[r][ids[i]] += w
                acc[r] += w
    for r in RANKS:
        s = acc[r]
        if s > 0:
            for k2 in list(prof[r].keys()):
                prof[r][k2] = 100.0 * prof[r][k2] / s
    return prof


# ----------------------------------------------------------------------
# contig pairing + per-rank accuracy


def _besthit_remap(
    pred_fasta: str, gt_fasta: str, min_cov: float = 0.95, min_id: float = 0.95
) -> Dict[str, str]:
    """Best-hit contig remap using the minimizer aligner (replaces the
    reference's minimap2 subprocess, ``eval_cami.py:333-353``)."""
    from hymet_tpu.io.fasta import read_fasta
    from hymet_tpu.io.minimizer_index import MinimizerIndex
    from hymet_tpu.models.aligner import MinimizerAligner

    idx = MinimizerIndex.build_from_fasta(gt_fasta)
    aligner = MinimizerAligner(idx)
    names, seqs = read_fasta(pred_fasta)
    best: Dict[str, Tuple[int, str]] = {}
    for rec in aligner.map_batch(names, seqs):
        cov = (rec.qend - rec.qstart) / rec.qlen if rec.qlen > 0 else 0.0
        iden = rec.nmatch / rec.blocklen if rec.blocklen > 0 else 0.0
        if cov < min_cov or iden < min_id:
            continue
        cur = best.get(rec.qname)
        if cur is None or rec.nmatch > cur[0]:
            best[rec.qname] = (rec.nmatch, rec.tname)
    return {q: t for q, (_, t) in best.items()}


def eval_contigs(
    pred_file: Optional[str],
    gt_files: Sequence[Optional[str]],
    taxdb: TaxonomyDB,
    outdir: str,
    pred_fasta: Optional[str] = None,
    gt_fasta: Optional[str] = None,
    taxmap_path: Optional[str] = None,
    paf_path: Optional[str] = None,
) -> dict:
    idmap = (
        IdentifierMap.from_detailed_taxonomy(taxmap_path)
        if taxmap_path and os.path.isfile(taxmap_path)
        else None
    )
    pred_tid = preds_taxid_from_classified(pred_file, taxdb, idmap, paf_path)

    gt_map: Dict[str, str] = {}
    for gtf in gt_files:
        gt_map.update(load_gt_contigs(gtf))

    pairs: List[Tuple[str, str, str]] = []
    for q, tid in pred_tid.items():
        if q in gt_map:
            pairs.append((q, tid, gt_map[q]))

    if not pairs and pred_fasta and gt_fasta and os.path.isfile(pred_fasta) and os.path.isfile(gt_fasta):
        pred_hash = fasta_hashes(pred_fasta)
        gt_hash = fasta_hashes(gt_fasta)
        inv_gt = collections.defaultdict(list)
        for gname, hsh in gt_hash.items():
            inv_gt[hsh].append(gname)
        for q in list(pred_tid.keys()):
            hsh = pred_hash.get(q)
            if not hsh:
                continue
            for t in inv_gt.get(hsh, []):
                gtid = gt_map.get(t)
                if gtid:
                    pairs.append((q, pred_tid[q], gtid))

    if not pairs and pred_fasta and gt_fasta and os.path.isfile(pred_fasta) and os.path.isfile(gt_fasta):
        q2t = _besthit_remap(pred_fasta, gt_fasta)
        for q, t in q2t.items():
            pt = pred_tid.get(q)
            gtid = gt_map.get(t)
            if pt and gtid:
                pairs.append((q, pt, gtid))

    usable = len(pairs)
    exact = sum(1 for _, pt, gtid in pairs if pt == gtid)

    tids = {pt for _, pt, _ in pairs} | {gtid for *_, gtid in pairs}
    tpaths = {tid: taxdb.taxpath(tid) for tid in tids}

    per_rank = {}
    for i, r in enumerate(RANKS):
        tot = 0
        ok = 0
        for _, pt, gtid in pairs:
            pids = tpaths.get(pt, ("", ""))[0]
            gids = tpaths.get(gtid, ("", ""))[0]
            if not pids or not gids:
                continue
            pvec = pids.split("|")
            gvec = gids.split("|")
            if i >= len(pvec) or i >= len(gvec):
                continue
            pid, gid = pvec[i], gvec[i]
            # the reference counts empty (rank-truncated) slots — only "NA"
            # is skipped — so a genus-level prediction scores as incorrect
            # at species rank rather than being excluded (eval_cami.py:544)
            if pid == "NA" or gid == "NA":
                continue
            tot += 1
            if pid == gid:
                ok += 1
        per_rank[r] = {"n": tot, "acc": (100.0 * ok / tot if tot else 0.0), "correct": ok}

    exact_path = os.path.join(outdir, "contigs_exact.tsv")
    perrank_path = os.path.join(outdir, "contigs_per_rank.tsv")
    if usable > 0:
        with open(exact_path, "w", newline="") as w:
            wr = csv.writer(w, delimiter="\t")
            wr.writerow(["metric", "value"])
            wr.writerow(["usable_pairs", usable])
            wr.writerow(["exact_taxid_matches", exact])
            wr.writerow(["exact_taxid_accuracy_percent", 100.0 * exact / usable])
        with open(perrank_path, "w", newline="") as w:
            wr = csv.writer(w, delimiter="\t")
            wr.writerow(["rank", "n", "correct", "accuracy_percent"])
            for r in RANKS:
                m = per_rank.get(r, {"n": 0, "correct": 0, "acc": 0.0})
                wr.writerow([r, m["n"], m["correct"], f"{m['acc']:.4f}"])
    else:
        for p in (exact_path, perrank_path):
            if os.path.exists(p):
                os.remove(p)

    return {
        "usable_pairs": usable,
        "exact": exact,
        "per_rank": per_rank,
        "pred_n": len(pred_tid),
        "gt_n": len(gt_map),
    }


# ----------------------------------------------------------------------
# top-level


def evaluate(
    pred_profile: Optional[str],
    truth_profile: Optional[str],
    outdir: str,
    pred_contigs: Optional[str] = None,
    truth_contigs: Optional[str] = None,
    pred_fasta: Optional[str] = None,
    truth_fasta: Optional[str] = None,
    taxonomy_dir: Optional[str] = None,
    taxmap: Optional[str] = None,
    paf: Optional[str] = None,
    presence_thresh: float = 0.1,
) -> int:
    pathlib.Path(outdir).mkdir(parents=True, exist_ok=True)
    taxdb = _load_taxdb(taxonomy_dir)
    gt_files = [truth_contigs] if truth_contigs else []

    pred_prof = load_profile_any(pred_profile, taxdb)
    truth_prof = load_profile_any(truth_profile, taxdb)
    need_pred_fb = all(not pred_prof[r] for r in RANKS)
    need_truth_fb = all(not truth_prof[r] for r in RANKS)

    lens: Dict[str, int] = {}
    if need_pred_fb or need_truth_fb:
        lens = fasta_lengths([pred_fasta, truth_fasta])
    if need_pred_fb and pred_contigs:
        idmap = (
            IdentifierMap.from_detailed_taxonomy(taxmap)
            if taxmap and os.path.isfile(taxmap)
            else None
        )
        cont2tid = preds_taxid_from_classified(pred_contigs, taxdb, idmap, paf)
        pred_prof = profiles_from_contig_maps(cont2tid, lens, taxdb)
    if need_truth_fb and gt_files:
        gt_map: Dict[str, str] = {}
        for g in gt_files:
            gt_map.update(load_gt_contigs(g))
        truth_prof = profiles_from_contig_maps(gt_map, lens, taxdb)

    with open(os.path.join(outdir, "profile_summary.tsv"), "w", newline="") as w:
        wr = csv.writer(w, delimiter="\t")
        wr.writerow(
            [
                "rank",
                "L1_total_variation_pctpts",
                "BrayCurtis_pct",
                "Precision_%",
                "Recall_%",
                "F1_%",
                "TP",
                "FP",
                "FN",
            ]
        )
        for r in RANKS:
            l1, bc = l1_and_braycurtis(pred_prof[r], truth_prof[r])
            pr, rc, f1, tp, fp, fn = prf_presence(pred_prof[r], truth_prof[r], presence_thresh)
            wr.writerow([r, f"{l1:.4f}", f"{bc:.4f}", f"{pr:.2f}", f"{rc:.2f}", f"{f1:.2f}", tp, fp, fn])

    if pred_contigs and gt_files:
        eval_contigs(
            pred_contigs,
            gt_files,
            taxdb,
            outdir,
            pred_fasta=pred_fasta,
            gt_fasta=truth_fasta,
            taxmap_path=taxmap,
            paf_path=paf,
        )

    # per-rank abundance diff tables + human summary (the prior
    # evaluator's extras, reference tools/eval_cami_prior.py:435-446)
    with open(os.path.join(outdir, "summary.txt"), "w") as w:
        w.write("# Profile-level metrics (per rank)\n")
        for r in RANKS:
            l1, bc = l1_and_braycurtis(pred_prof[r], truth_prof[r])
            pr, rc, f1, tp, fp, fn = prf_presence(pred_prof[r], truth_prof[r], presence_thresh)
            w.write(
                f"{r:14s}  L1={l1:.3f}  BC={bc:.3f}%  "
                f"P/R/F1={pr:.1f}/{rc:.1f}/{f1:.1f}% (TP={tp}, FP={fp}, FN={fn})\n"
            )
    for r in RANKS:
        keys = set(pred_prof[r]) | set(truth_prof[r])
        if not keys:
            continue
        with open(os.path.join(outdir, f"profile_diffs_{r}.tsv"), "w", newline="") as w:
            wr = csv.writer(w, delimiter="\t")
            wr.writerow(["taxid", "pred_pct", "truth_pct", "diff"])
            for k2 in sorted(
                keys,
                key=lambda t: -abs(pred_prof[r].get(t, 0.0) - truth_prof[r].get(t, 0.0)),
            ):
                a = pred_prof[r].get(k2, 0.0)
                b = truth_prof[r].get(k2, 0.0)
                wr.writerow([k2, f"{a:.6f}", f"{b:.6f}", f"{a - b:.6f}"])

    with open(os.path.join(outdir, "_debug_info.txt"), "w") as w:
        w.write(f"pred_profile_path: {pred_profile}\n")
        w.write(f"truth_profile_path: {truth_profile}\n")
        w.write(f"pred_contigs_path: {pred_contigs}\n")
        w.write("truth_contigs_paths:\n  " + "\n  ".join(g for g in gt_files if g) + "\n")
        w.write(f"pred_fasta: {pred_fasta}\n")
        w.write(f"truth_fasta: {truth_fasta}\n")
        w.write(f"taxonomy_dir: {taxonomy_dir}\n")
        w.write(f"taxmap: {taxmap}\n")
        w.write(f"paf: {paf}\n")
    return 0


def _load_taxdb(taxonomy_dir: Optional[str]) -> TaxonomyDB:
    if taxonomy_dir:
        if os.path.exists(os.path.join(taxonomy_dir, "names.dmp")):
            return TaxonomyDB.from_taxdump(taxonomy_dir)
        tsv = (
            taxonomy_dir
            if taxonomy_dir.endswith(".tsv")
            else os.path.join(taxonomy_dir, "taxonomy_hierarchy.tsv")
        )
        if os.path.exists(tsv):
            return TaxonomyDB.from_hierarchy_tsv(tsv)
    return TaxonomyDB()
