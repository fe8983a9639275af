from casf_spark.operators import (curation, dedup, joins, pipeline, profile,
                                  relevance, sampling, similarity, skew)

__all__ = ["curation", "dedup", "joins", "pipeline", "profile", "relevance",
           "sampling", "similarity", "skew"]
