"""dev_clickhouse_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference SIEM lakehouse
(ghulamazka13/dev-clickhouse), re-expressed Spark-first.

Layout (see SURVEY.md §7.1):

- ``session``    SparkSession factory + runtime tuning (TZ, AQE, parquet nanos)
- ``io``         batch readers for the driver test tables and generic parquet/JDBC
- ``functions``  ClickHouse-compatible scalar function layer (date keys, JSON,
                 hash surrogate keys, lenient parsing)
- ``operators``  composite relational operators the reference uses: as-of join,
                 SCD1/SCD2 upserts, replacing-merge dedupe, top-k
- ``sources``    bronze extraction (raw JSON → typed rows) for the three
                 security-event streams (suricata / wazuh / zeek)
- ``gold``       star-schema builders: conformed dims, SCD2 dims, facts, bridges
- ``plans``      metadata-driven pipeline spec + topologically-ordered runner
- ``streaming``  Structured Streaming ingest (file/kafka → bronze fanout)
- ``llm``        beyond-reference large-scale training-data ops: dedup family,
                 similarity search, text analysis, multimodal column plumbing
- ``queries``    the user-facing query pack (BI examples + operator queries)
"""

__version__ = "0.1.0"
