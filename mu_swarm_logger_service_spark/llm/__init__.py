"""LLM-data-pipeline operators — SURVEY.md §2.11 rows 74-82.

The training-data-pipeline extension mandated by BASELINE.json:6:
deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard), similarity
search over embeddings, text analysis (stats, quality, language-ID,
TF-IDF, fingerprinting), and multimodal binary columns — all on the
`documents` / `embeddings` testdata tables.
"""

from . import clustering, dedup, multimodal, similarity, text  # noqa: F401
