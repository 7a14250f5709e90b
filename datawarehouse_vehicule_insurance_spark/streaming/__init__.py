"""Structured Streaming pipelines (additive scope — the reference is
batch-only, SURVEY.md §1.5/§7.2 step 6)."""

from datawarehouse_vehicule_insurance_spark.streaming.curation import (
    run_incremental_curation,
    run_incremental_embedding_ingest,
)
from datawarehouse_vehicule_insurance_spark.streaming.events import (
    hourly_rollup,
    read_event_stream,
    sessionize,
)

__all__ = [
    "read_event_stream",
    "hourly_rollup",
    "sessionize",
    "run_incremental_curation",
    "run_incremental_embedding_ingest",
]
