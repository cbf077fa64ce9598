"""Airflow DAG scheduling the streaming-curation jobs — the
LLM-data-pipeline counterpart of `weatherflow_spark_dag.py` (same
deployment shape: Spark jobs scheduled via Airflow, BASELINE.json
`spark_approach`).

Two tasks per slot, sequenced so the maintenance task runs in the
single-writer idle window Compaction's swap contract requires:

  1. spark_curation — graft.pipeline.CurationJob drains the files
     that arrived since the last slot through the composed pipeline
     (exact ingest -> LSH near-dup admission -> rollup -> CMS
     maintenance -> atomic publish). AvailableNow + checkpoint makes
     a rerun of a failed slot resume at the first uncommitted epoch;
     every stage is replay-idempotent, so retries=1 is safe.
  2. spark_maintenance — graft.ops.MaintenanceJob compacts the
     curated store's per-batch small files and refreshes its column
     statistics. It runs AFTER the writer finished; if an overlapping
     slot ever appended concurrently, compaction aborts cleanly
     (original intact) and the next slot retries.

Not executable in this container (no Airflow runtime, driver-side
pyspark only) — deployment artifact + documentation, validated by
tools/check.py's stubbed-provider exec.
"""
from datetime import datetime, timedelta

from airflow import DAG
from airflow.providers.apache.spark.operators.spark_submit import (
    SparkSubmitOperator,
)

default_args = {
    "owner": "graft",
    "retries": 1,
    "retry_delay": timedelta(minutes=2),
}

with DAG(
    dag_id="graft_curation",
    description="15-minute micro-batch corpus curation (Spark-native)",
    schedule=timedelta(minutes=15),
    start_date=datetime(2026, 1, 1),
    catchup=False,
    max_active_runs=1,            # single writer: required by both the
    default_args=default_args,    # checkpoint and the compaction swap
) as dag:
    curate = SparkSubmitOperator(
        task_id="spark_curation",
        application="{{ var.value.graft_jar }}",
        java_class="graft.pipeline.CurationJob",
        application_args=[
            "{{ var.value.graft_landing_dir }}",
            "{{ var.value.graft_curation_base }}",
            "{{ var.value.get('graft_neardup_tau', '0.5') }}",
        ],
        conf={
            "spark.sql.session.timeZone": "UTC",
            "spark.sql.adaptive.enabled": "true",
        },
    )
    maintain = SparkSubmitOperator(
        task_id="spark_maintenance",
        application="{{ var.value.graft_jar }}",
        java_class="graft.ops.MaintenanceJob",
        application_args=[
            "{{ var.value.graft_curation_base }}/curated",
            "{{ var.value.get('graft_compact_target_mb', '128') }}",
        ],
        conf={"spark.sql.adaptive.enabled": "true"},
    )
    curate >> maintain
