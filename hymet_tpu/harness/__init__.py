"""Experiment harnesses: CAMI benchmark, case study, DB ablation, truth
building, measurement, aggregation, plots.

Mirrors the reference's ``bench/`` and ``case/`` layers (SURVEY.md §2.3,
§2.4) with the same manifests, output trees
(``out/<sample>/<tool>/{profile.cami.tsv, classified_sequences.tsv,
eval/, metadata.json}``), runtime_memory.tsv schema, and aggregate tables.
"""
