"""Relational / corpus-level operators: dedup families, similarity search,
metric-engine date-spine aggregation, sessionization, report compare."""
