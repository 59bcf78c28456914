"""Training-data pipeline layer: deduplication, similarity search, text
analysis, and multimodal plumbing over the ``documents`` / ``embeddings``
tables.

These are the operations a 100 TB pretraining-data pipeline runs on top of
the crawl engine's document layer (task brief: dedup / ANN / multimodal /
text-analysis as first-class components). Everything is expressed as native
DataFrame transformations — the only Python crossings are the clearly-marked
multimodal decode stubs (Arrow-batched ``mapInPandas``).
"""
