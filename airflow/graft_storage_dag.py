"""Airflow DAG for the MANAGED-TABLE storage loop — the operational
face of the round-9 storage wave (`graft.ops.StorageJob`): drain the
compliance-delete feed into the table's merge-on-read ledger, fold
the ledger into a new data version once it has grown past the
compaction threshold (bounding every reader's anti-join), and refresh
the zone-map catalog incrementally so `plans/ZoneMapRule`'s automatic
scan pruning stays armed.

One task per slot on purpose: the three steps share the table's
single-writer window (DeleteLedger's deleter/compactor contract), so
they run inside ONE job in a fixed order rather than as parallel
Airflow tasks that could interleave. max_active_runs=1 IS the
single-writer guarantee; every step is replay-idempotent (checkpoint
drains nothing twice, a retried compaction lands on a fresh version
number, a retried catalog refresh stats zero new files), so
retries=1 is safe.

Not executable in this container (no Airflow runtime) — deployment
artifact + documentation, validated by tools/check.py's
stubbed-provider exec.
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
    dag_id="graft_storage",
    description="hourly managed-table maintenance: delete feed, compaction, zone-map refresh",
    schedule=timedelta(hours=1),
    start_date=datetime(2026, 1, 1),
    catchup=False,
    max_active_runs=1,            # the table's single-writer window
    default_args=default_args,
) as dag:
    maintain = SparkSubmitOperator(
        task_id="spark_storage_maintenance",
        application="{{ var.value.graft_jar }}",
        java_class="graft.ops.StorageJob",
        application_args=[
            "{{ var.value.graft_table_base }}",
            "{{ var.value.graft_delete_feed_dir }}",
            "{{ var.value.graft_table_pk }}",
            "{{ var.value.get('graft_compact_at_rows', '1000000') }}",
            "{{ var.value.get('graft_zonemap_cols', 'ts') }}",
        ],
        conf={
            "spark.sql.session.timeZone": "UTC",
            "spark.sql.adaptive.enabled": "true",
        },
    )
