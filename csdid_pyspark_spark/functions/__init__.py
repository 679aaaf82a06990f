from csdid_pyspark_spark.functions.formula import parse_formula

__all__ = ["parse_formula"]
