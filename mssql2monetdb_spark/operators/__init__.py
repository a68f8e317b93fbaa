"""Large-scale training-data-pipeline operators (SURVEY.md §2C).

Everything is expressed as shuffle-friendly DataFrame compositions — no
``collect()`` loops, no row-at-a-time Python. Candidate generation for the
pairwise operators (MinHash-LSH, n-gram Jaccard, embedding near-dup) is
always bucketed/banded so the join never degenerates to a cross product at
100 TB.
"""

from . import dedup, multimodal, similarity, textstats  # noqa: F401
