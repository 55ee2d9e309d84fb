from .ingest import ingest_posts_stream, start_upsert_stream, upsert_parquet_by_key, write_queue_batch

__all__ = [
    "ingest_posts_stream",
    "start_upsert_stream",
    "upsert_parquet_by_key",
    "write_queue_batch",
]
