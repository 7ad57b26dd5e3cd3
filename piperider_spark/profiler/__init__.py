from piperider_spark.profiler.core import Profiler, classify_type, profile_table  # noqa: F401
from piperider_spark.profiler.formatting import format_float, percentage  # noqa: F401
from piperider_spark.profiler.report import build_run_report, clean_nulls, write_run_json  # noqa: F401
