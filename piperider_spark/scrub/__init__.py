from piperider_spark.scrub.rules import SCRUB_RULES, scrub_text  # noqa: F401
from piperider_spark.scrub.udf import scrub_udf, with_scrubbed_text  # noqa: F401
