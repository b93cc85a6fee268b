"""cflog2otel_spark: PySpark-native CloudFront-log -> OTel-metrics pipeline."""

__version__ = "0.1.0"
