from piperider_spark.rules.heuristics import RULE_ORDER, apply_rules, rule_columns  # noqa: F401
from piperider_spark.rules.spec import RuleSpec  # noqa: F401
