"""Stateful / composite operators: Bloom URL-seen filter, politeness token
bucket, priority dequeue, dedup family, similarity search."""
