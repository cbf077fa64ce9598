"""Airflow DAG scheduling the Spark ETL job (the deployment shape named
by BASELINE.json `spark_approach`: "Spark jobs scheduled via Airflow").

The reference runs a four-task Python diamond every 5 minutes with JSON
XCom hand-offs between tasks (dags/etl.py:159). Here the whole pipeline
is ONE spark-submit — the diamond lives inside Catalyst as a single
narrow plan, so there is nothing to hand off and no serialization
boundary. Airflow contributes exactly what it is good at: cadence,
retries, and backfill control.

Not executable in this container (no Airflow runtime, driver-side
pyspark only) — deployment artifact + documentation.
"""
from datetime import datetime, timedelta

from airflow import DAG
from airflow.providers.apache.spark.operators.spark_submit import (
    SparkSubmitOperator,
)

default_args = {
    "owner": "weatherflow",
    "retries": 1,
    "retry_delay": timedelta(minutes=1),
}

with DAG(
    dag_id="weatherflow_spark_etl",
    description="5-minute micro-batch weather ETL (Spark-native)",
    schedule=timedelta(minutes=5),   # reference cadence, dags/etl.py:129
    start_date=datetime(2026, 1, 1),
    catchup=False,                   # reference sets catchup=False
    max_active_runs=1,
    default_args=default_args,
) as dag:
    # One task, one Spark job. Each run writes an idempotent,
    # run-scoped output directory (rerun => same dir, atomic overwrite
    # per table + completion manifest) — fixing the reference's
    # duplicate-facts-on-retry defect (fresh uuid4 keys per attempt,
    # dags/etl.py:103).
    etl = SparkSubmitOperator(
        task_id="spark_etl",
        application="{{ var.value.weatherflow_jar }}",
        java_class="graft.pipeline.EtlJob",
        application_args=[
            "{{ var.value.weatherflow_warehouse }}/batch={{ ts_nodash }}",
            "{{ var.value.get('weatherflow_stations', '4') }}",
            "{{ var.value.get('weatherflow_ticks', '12') }}",
        ],
        conf={
            "spark.sql.session.timeZone": "UTC",
            "spark.sql.adaptive.enabled": "true",
        },
    )
