"""starchart_spark — a PySpark-native federated-forge crawl engine.

A from-scratch re-expression of the capabilities of forgeflux-org/starchart
(reference at /root/reference, Rust) as idiomatic Spark dataflow:

- an explicit URL frontier (designed for 10^10 rows) over snapshot tables,
- canonicalize-then-hash URL-seen membership (partitioned bloom + cuckoo
  pre-filters, exact anti-join confirm),
- a per-host politeness scheduler (token-bucket slot assignment) expressed
  as vectorized ``applyInPandas`` over salted host buckets,
- forge-type dispatch (Gitea wire shape today) as a broadcast-joined
  normalizer over interleaved text+media span documents,
- checkpoint/resume via table snapshots with per-partition lineage counters,
- a training-data-pipeline operator suite (dedup, similarity search, text
  quality, multimodal plumbing) over the same engine.

Nothing here is a port: the reference is an imperative row-at-a-time spider;
this package declares the same *semantics* as DataFrame plans and lets
Catalyst/AQE pick physical strategies.
"""

__version__ = "0.1.0"
