from casf_spark.operators import (dedup, joins, pipeline, profile, sampling,
                                  similarity, skew)

__all__ = ["dedup", "joins", "pipeline", "profile", "sampling",
           "similarity", "skew"]
