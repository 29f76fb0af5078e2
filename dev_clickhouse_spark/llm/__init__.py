"""Beyond-reference large-scale training-data pipeline operators.

The reference's data plane has no UDF surface (SURVEY.md §2.10); these modules
extend the engine with the operations a 100 TB training-data pipeline needs —
text analysis, the dedup family (exact / n-gram Jaccard / MinHash-LSH /
SimHash), embedding similarity search, and multimodal column plumbing —
importable individually and registered as driver queries.
"""

from . import dedup, multimodal, similarity, text  # noqa: F401
