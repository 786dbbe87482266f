"""Extra data sources with no native Spark reader (TFRecord,
promptsource contamination templates, …)."""

from wimbd_spark.sources.templates import (  # noqa: F401
    load_template_fields,
    parse_templates_yaml,
    template_eval_phrases,
    template_fields,
)
from wimbd_spark.sources.tfrecord import read_tfrecords  # noqa: F401
