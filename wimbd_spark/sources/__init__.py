"""Extra data sources with no native Spark reader (TFRecord, …)."""

from wimbd_spark.sources.tfrecord import read_tfrecords  # noqa: F401
