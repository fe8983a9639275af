from casf_spark.plans.inspect import explain_str, assert_no_cartesian, scan_read_schema

__all__ = ["explain_str", "assert_no_cartesian", "scan_read_schema"]
