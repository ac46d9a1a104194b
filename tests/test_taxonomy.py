"""Taxonomy component tests: lineage codec, taxdump parsing, taxpath, and
hierarchy-TSV parity with the reference generator's semantics
(reference scripts/taxonomy_hierarchy.py, tools/hymet2cami.py)."""

import os

from hymet_tpu import RANKS
from hymet_tpu.taxonomy import TaxonomyDB, lineage_to_rank_names


def test_lineage_codec_rank_name_form():
    s = "superkingdom:Bacteria; phylum:Bacillota; genus:Bacillus; species:Bacillus subtilis"
    v = lineage_to_rank_names(s)
    assert v[0] == "Bacteria"
    assert v[1] == "Bacillota"
    assert v[5] == "Bacillus"
    assert v[6] == "Bacillus subtilis"
    assert v[2] == v[3] == v[4] == v[7] == ""


def test_lineage_codec_aliases_and_kstyle():
    v = lineage_to_rank_names("k__Bacteria; p__Firmicutes; s__E coli")
    assert v[0] == "Bacteria" and v[1] == "Firmicutes" and v[6] == "E coli"
    # domain/kingdom alias to superkingdom
    v = lineage_to_rank_names("domain:Archaea")
    assert v[0] == "Archaea"
    # subspecies aliases to strain
    v = lineage_to_rank_names("subspecies:K-12")
    assert v[7] == "K-12"


def test_lineage_codec_plain_ordered():
    v = lineage_to_rank_names("Bacteria; Firmicutes; Bacilli")
    assert v[:3] == ["Bacteria", "Firmicutes", "Bacilli"]
    v = lineage_to_rank_names("Bacteria|NA|Bacilli")
    # NA is dropped, remaining names shift up (reference semantics)
    assert v[:2] == ["Bacteria", "Bacilli"]


def test_lineage_codec_empty():
    assert lineage_to_rank_names("") == [""] * len(RANKS)
    assert lineage_to_rank_names(None) == [""] * len(RANKS)


def test_mini_db_lineage_and_taxpath(mini_taxdb):
    lin = mini_taxdb.lineage_string("1423")
    assert lin.endswith("species:Bacillus subtilis")
    assert "genus:Bacillus" in lin
    assert lin.startswith("no rank:cellular organisms")

    ids, names = mini_taxdb.taxpath("1423")
    assert ids == "2|1239|91061|1385|186817|1386|1423"
    assert names == (
        "Bacteria|Bacillota|Bacilli|Bacillales|Bacillaceae|Bacillus|Bacillus subtilis"
    )

    # partial path (genus-level taxid)
    ids, names = mini_taxdb.taxpath("1386")
    assert ids == "2|1239|91061|1385|186817|1386|"


def test_name2taxid(mini_taxdb):
    assert mini_taxdb.name2taxid("Bacillus subtilis") == "1423"
    assert mini_taxdb.name2taxid("bacillus subtilis") == "1423"  # case fold
    assert mini_taxdb.name2taxid("Nonexistent thing") is None
    m = mini_taxdb.batch_name2taxid(["Bacteria", "Escherichia coli", "zzz"])
    assert m == {"Bacteria": "2", "Escherichia coli": "562"}


def test_rank_names_vector(mini_taxdb):
    v = mini_taxdb.rank_names_vector("511145")
    assert v[6] == "Escherichia coli"
    assert v[7] == "Escherichia coli str. K-12 substr. MG1655"
    assert v[0] == "Bacteria"


def test_ancestor_at_rank(mini_taxdb):
    assert mini_taxdb.ancestor_at_rank("511145", "genus") == "561"
    assert mini_taxdb.ancestor_at_rank("511145", "superkingdom") == "2"
    assert mini_taxdb.ancestor_at_rank("2", "species") is None


def test_taxdump_roundtrip(tmp_path, mini_taxdb):
    """Write a names/nodes.dmp pair, load via from_taxdump, compare
    lineages; also exercise the strain promotion rule
    (reference taxonomy_hierarchy.py:32-33)."""
    names_lines = []
    nodes_lines = []
    for taxid in mini_taxdb.rank:
        nm = mini_taxdb.name[taxid]
        rank = mini_taxdb.rank[taxid]
        parent = mini_taxdb.parent[taxid]
        names_lines.append(f"{taxid}\t|\t{nm}\t|\t\t|\tscientific name\t|\n")
        # encode strain rank as "no rank" + strain-flag field to test promotion
        if rank == "strain":
            nodes_lines.append(
                f"{taxid}\t|\t{parent}\t|\tno rank\t|\t\t|\tstrain\t|\n"
            )
        else:
            nodes_lines.append(f"{taxid}\t|\t{parent}\t|\t{rank}\t|\t\t|\t\t|\n")
    # add root
    names_lines.append("1\t|\troot\t|\t\t|\tscientific name\t|\n")
    nodes_lines.append("1\t|\t1\t|\tno rank\t|\t\t|\t\t|\n")
    (tmp_path / "names.dmp").write_text("".join(names_lines))
    (tmp_path / "nodes.dmp").write_text("".join(nodes_lines))

    db = TaxonomyDB.from_taxdump(str(tmp_path))
    assert db.rank["511145"] == "strain"
    for taxid in mini_taxdb.rank:
        assert db.lineage_string(taxid) == mini_taxdb.lineage_string(taxid)


def test_hierarchy_tsv_roundtrip(tmp_path, mini_taxdb):
    path = os.path.join(tmp_path, "taxonomy_hierarchy.tsv")
    mini_taxdb.write_hierarchy_tsv(path)
    db = TaxonomyDB.from_hierarchy_tsv(path)
    assert db.name["1423"] == "Bacillus subtilis"
    assert db.rank["1423"] == "species"
    assert db.lineage_string("1423") == mini_taxdb.lineage_string("1423")


def test_merged_resolution():
    db = TaxonomyDB.from_records([("2", "Bacteria", "superkingdom", "1")])
    db.merged["999"] = "2"
    assert db.resolve("999") == "2"
    assert db.rank_names_vector("999")[0] == "Bacteria"


def test_build_rank_table(mini_taxdb):
    taxids = ["1423", "562", "511145"]
    table, index, names = mini_taxdb.build_rank_table(taxids)
    assert table.shape == (3, len(RANKS))
    assert names[0] == ""
    # row for 1423: superkingdom Bacteria, species Bacillus subtilis
    assert names[table[0, 0]] == "Bacteria"
    assert names[table[0, 6]] == "Bacillus subtilis"
    # shared superkingdom name id
    assert table[0, 0] == table[1, 0] == table[2, 0]
    # strain name present only for 511145
    assert table[2, 7] != 0 and table[0, 7] == 0
    assert index["562"] == 1
