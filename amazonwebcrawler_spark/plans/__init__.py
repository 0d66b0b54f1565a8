"""End-to-end pipelines: the wave-loop crawl engine and the three reports
(keyword rank, category inventory, per-SKU best-sellers rank)."""
