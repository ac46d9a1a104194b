"""Evaluation & conversion stack.

Mirrors the reference's L5 layer (SURVEY.md §1): CAMI profile
export/parsing, profile + per-contig metrics, superkingdom-taxid fixing,
metric aggregation — all with the in-process taxonomy component instead of
taxonkit subprocesses.
"""
