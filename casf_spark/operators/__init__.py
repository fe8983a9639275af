from casf_spark.operators import (cdc, checks, curation, dedup, joins,
                                  linalg, pipeline, profile, relevance,
                                  sampling, similarity, sketches, skew)

__all__ = ["cdc", "checks", "curation", "dedup", "joins", "linalg",
           "pipeline", "profile", "relevance", "sampling", "similarity",
           "sketches", "skew"]
