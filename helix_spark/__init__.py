"""helix-spark: a PySpark-native distributed crawl + data-pipeline engine.

A from-scratch reimplementation of the crawl semantics of miniskylab/Helix
(reference: /root/reference, C#/.NET TPL-Dataflow) as an iterative-batch BFS
over snapshot-committed DataFrame tables:

- URL frontier with a bloom/cuckoo URL-seen set over xxhash64-canonicalized URLs
- per-host politeness-aware priority queue with explicit skew splitting
- robots.txt-gated fetch batches
- MERGE-upsert verification-results sink (one row per verified_url)
- checkpoint/resume via atomic table snapshots with per-partition lineage

All compute is DataFrame column expressions, joins, windows, and vectorized
pandas/Arrow UDFs — no per-row Python UDFs anywhere.
"""

__version__ = "0.1.0"
