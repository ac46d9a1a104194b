"""Pipeline orchestration: stage drivers, candidate selection, caching.

Host-side control around the device kernels, reproducing the reference
batch driver's behavior (``run_hymet_cami.sh``) with the same intermediate
file contracts (screen.tab -> selected_genomes.txt -> combined ref ->
PAF -> classified_sequences.tsv -> CAMI profile).
"""
