from csdid_pyspark_spark.did.attgt import ATTgt
from csdid_pyspark_spark.did.preprocess import PanelData, preprocess_did

__all__ = ["ATTgt", "PanelData", "preprocess_did"]
