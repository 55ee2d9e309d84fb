"""Shared storage-layer building blocks for the persistent stores
(ANN index, MinHash-LSH dedup index, versioned snapshot store)."""
