"""Ingestion layer: the reference's Layer-A operators (SURVEY.md §2.A)
re-expressed for a distributed engine — paginated REST source with the
retry/backoff/dead-letter policy, durable offset checkpointing,
partitioned sinks, and idempotent upsert."""
