"""price_crawler_spark — a from-scratch PySpark-native rebuild of the
capabilities of MAODAN0204/price_crawler (reference at /root/reference,
read-only).

Layers (SURVEY.md §7.0):
  1. frontier/  — URL frontier, canonicalization, Bloom URL-seen, politeness
                  scheduler, wave-loop driver with checkpoint/resume.
  2. sources/   — deterministic synthetic document/frontier generators and a
                  parquet+manifest snapshot store (Iceberg-style shim).
  3. operators/ — span extraction → products, search pipeline (similarity,
                  filters, sort, top-k, stats, pagination), dedup suite,
                  similarity search, multimodal plumbing.
  4. functions/ — scalar column libraries (price, name, URL, text analysis).

Everything is DataFrame-native; Python reaches the data plane only through
vectorized pandas/Arrow UDFs (similarity, bloom shards, fetch simulation),
never per-row Python — per BASELINE.json input_hint.
"""

__version__ = "0.1.0"
