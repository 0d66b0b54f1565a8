"""amazonwebcrawler_spark — a PySpark-native crawl frontier + fetch scheduler.

A from-scratch re-expression of the capabilities of CaryWill/AmazonWebCrawler
(reference at /root/reference, surveyed in SURVEY.md) as an idiomatic Spark
engine: DataFrame/SQL logical plans, vectorized pandas/Arrow UDFs for the
fetch/parse/image kernels, partitioned Bloom-filter URL-seen state, per-host
token-bucket politeness with salting for skew, and snapshot-per-wave
checkpointing for exact resume.

Layout
------
functions/   pure column expressions + pandas UDFs (urls, rank math, text, images)
operators/   stateful building blocks (bloom filter, dedup, similarity, politeness)
sources/     synthetic deterministic web world + seed/dims tables + state store
plans/       end-to-end pipelines (rank report, inventory probe, BSR, crawler loop)
streaming/   structured-streaming facade over the wave loop
"""

__version__ = "0.1.0"
