from casf_spark.operators import (cdc, checks, classify, curation, dedup,
                                  joins, linalg, pipeline, profile,
                                  relevance, sampling, similarity, sketches,
                                  skew)

__all__ = ["cdc", "checks", "classify", "curation", "dedup", "joins",
           "linalg", "pipeline", "profile", "relevance", "sampling",
           "similarity", "sketches", "skew"]
