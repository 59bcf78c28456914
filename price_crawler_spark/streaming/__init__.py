"""Structured Streaming layer.

The batch wave loop (price_crawler_spark.frontier.wave) is the primary
crawl driver — SURVEY.md §2.9 explains why (checkpoint/ordering semantics).
This package provides the continuous-ingest counterpart for deployments
that want the frontier fed from a stream:

  * ingest      — documents arriving as files → span extraction →
                  append sink (Trigger.AvailableNow for deterministic runs).
  * metrics     — watermarked, windowed fetch-log aggregation (late fetch
                  results tolerated up to the watermark).
  * seen_state  — streaming URL-seen dedup via applyInPandasWithState:
                  per-shard seen-set state, exactly the Bloom-shard shape of
                  the batch path but with Spark-managed state.
"""
