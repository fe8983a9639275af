from casf_spark.streaming import curation, events, sessions, stateful

__all__ = ["events", "sessions", "curation", "stateful"]
