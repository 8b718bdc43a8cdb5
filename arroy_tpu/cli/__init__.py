"""Command-line tools mirroring the reference example binaries.

Reference `examples/` (see SURVEY.md §2 "Examples/CLI"):

=====================  ===========================================
reference binary       arroy-tpu equivalent
=====================  ===========================================
import-vectors         ``python -m arroy_tpu.cli.import_vectors``
build-tree-no-commit   ``python -m arroy_tpu.cli.build_only``
stats                  ``python -m arroy_tpu.cli.stats``
graph                  ``python -m arroy_tpu.cli.graph``
search_movies          ``python -m arroy_tpu.cli.search_bench``
compare_with_hnsw      ``python -m arroy_tpu.cli.compare_exact``
fuzz                   ``python -m arroy_tpu.cli.fuzz``
sample_vectors         ``python -m arroy_tpu.cli.sample_vectors``
(ext. benchmark repo)  ``python -m arroy_tpu.cli.recall_sweep``
(src/upgrade.rs)       ``python -m arroy_tpu.cli.upgrade``
(extra: db fsck)       ``python -m arroy_tpu.cli.check``
=====================  ===========================================
"""
