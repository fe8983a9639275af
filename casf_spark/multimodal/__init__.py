from casf_spark.multimodal import binary

__all__ = ["binary"]
