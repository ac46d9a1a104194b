"""Data tooling: dataset subsetting, seqid maps, synthetic test datasets,
cache pruning — the reference's L6 layer (SURVEY.md §1, §2.5)."""
