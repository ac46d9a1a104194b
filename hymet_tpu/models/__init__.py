"""Classifier model families.

Mirrors the reference's three classifier variants (SURVEY.md §2.2):

- :mod:`hymet_tpu.models.weighted_lca` — production classifier
  (``scripts/classification_cami.py`` parity), vectorized in JAX.
- :mod:`hymet_tpu.models.legacy_lca` — legacy classifier with the
  exact-match shortcut (``scripts/classification.py:143-151``).
- :mod:`hymet_tpu.models.first_hit` — fallback first-PAF-hit classifier
  (``tools/mini_classify.py`` + ``tools/build_id_map.py``).
"""
