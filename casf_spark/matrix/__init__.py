from casf_spark.matrix.analyse import CosineAnalyser
from casf_spark.matrix.model import CosineModel

__all__ = ["CosineAnalyser", "CosineModel"]
