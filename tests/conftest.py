"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on the CPU backend with 8 virtual devices so that sharding /
collective code paths (pjit over a ("data", "db") mesh) are exercised without
TPU hardware, per the multi-device test strategy in SURVEY.md §4.
"""

import os
import sys

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# f64 on the CPU test backend so LCA parity tests are bit-exact vs the
# reference's Python-float semantics. Device code must stay dtype-explicit.
os.environ.setdefault("JAX_ENABLE_X64", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# NOTE: `import pytest` already imports jax (jaxtyping's pytest plugin), so
# env vars alone are too late for jax.config defaults. Backends initialize
# lazily, so config.update still takes effect here.
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mini_taxdb():
    """A small hand-built taxonomy covering the Zymo mock community species,
    mirroring the lineages in the in-repo truth profile
    (reference case/truth/zymo_mc/truth_profile.cami.tsv)."""
    from hymet_tpu.taxonomy import TaxonomyDB

    # (taxid, name, rank, parent)
    records = [
        ("131567", "cellular organisms", "no rank", "1"),
        ("2", "Bacteria", "superkingdom", "131567"),
        ("2759", "Eukaryota", "superkingdom", "131567"),
        ("1239", "Bacillota", "phylum", "2"),
        ("1224", "Pseudomonadota", "phylum", "2"),
        ("91061", "Bacilli", "class", "1239"),
        ("1236", "Gammaproteobacteria", "class", "1224"),
        ("1385", "Bacillales", "order", "91061"),
        ("186826", "Lactobacillales", "order", "91061"),
        ("91347", "Enterobacterales", "order", "1236"),
        ("72274", "Pseudomonadales", "order", "1236"),
        ("186817", "Bacillaceae", "family", "1385"),
        ("90964", "Staphylococcaceae", "family", "1385"),
        ("81852", "Enterococcaceae", "family", "186826"),
        ("33958", "Lactobacillaceae", "family", "186826"),
        ("1653", "Listeriaceae", "family", "1385"),
        ("543", "Enterobacteriaceae", "family", "91347"),
        ("135621", "Pseudomonadaceae", "family", "72274"),
        ("1386", "Bacillus", "genus", "186817"),
        ("1279", "Staphylococcus", "genus", "90964"),
        ("1350", "Enterococcus", "genus", "81852"),
        ("2742598", "Limosilactobacillus", "genus", "33958"),
        ("1637", "Listeria", "genus", "1653"),
        ("561", "Escherichia", "genus", "543"),
        ("590", "Salmonella", "genus", "543"),
        ("286", "Pseudomonas", "genus", "135621"),
        ("1423", "Bacillus subtilis", "species", "1386"),
        ("1280", "Staphylococcus aureus", "species", "1279"),
        ("1351", "Enterococcus faecalis", "species", "1350"),
        ("1613", "Limosilactobacillus fermentum", "species", "2742598"),
        ("1639", "Listeria monocytogenes", "species", "1637"),
        ("562", "Escherichia coli", "species", "561"),
        ("28901", "Salmonella enterica", "species", "590"),
        ("287", "Pseudomonas aeruginosa", "species", "286"),
        # fungi
        ("4890", "Ascomycota", "phylum", "2759"),
        ("5204", "Basidiomycota", "phylum", "2759"),
        ("4891", "Saccharomycetes", "class", "4890"),
        ("155619", "Tremellomycetes", "class", "5204"),
        ("4892", "Saccharomycetales", "order", "4891"),
        ("5234", "Tremellales", "order", "155619"),
        ("4893", "Saccharomycetaceae", "family", "4892"),
        ("1964185", "Cryptococcaceae", "family", "5234"),
        ("4930", "Saccharomyces", "genus", "4893"),
        ("5206", "Cryptococcus", "genus", "1964185"),
        ("4932", "Saccharomyces cerevisiae", "species", "4930"),
        ("5207", "Cryptococcus neoformans", "species", "5206"),
        # a strain for strain-rank testing
        ("511145", "Escherichia coli str. K-12 substr. MG1655", "strain", "562"),
    ]
    return TaxonomyDB.from_records(records)
