"""alco_ray — a Ray-Data-native log/transcript processing engine.

A from-scratch reimplementation of the capabilities of rutube/alco
(a centralized log collector: parse -> dictionary-enrich -> route/fan-out
-> index/aggregate), re-expressed as streaming ``ray.data.Dataset``
pipelines over Parquet tables of multi-turn conversation transcripts.

Design notes (SURVEY.md, BASELINE.json):
- All hot-path transforms are vectorized ``map_batches`` over zero-copy
  Arrow batches (``batch_format="pyarrow"``).
- Stateful stages (dictionary encoders, scorers) are callable classes run
  as actor pools.
- Wide steps (ordering, aggregates, dedup) use ``groupby``/``sort`` with
  explicit partitioning keys; small lookup sides are broadcast via
  ``ray.put``, never shuffled.
- Nothing in this package calls ``ray.init()``/``ray.shutdown()``; the
  caller (driver, bench.py, test fixture) owns the Ray session.
"""

__version__ = "0.1.0"
