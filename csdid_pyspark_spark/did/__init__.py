from csdid_pyspark_spark.did.attgt import ATTgt, aggte, att_gt
from csdid_pyspark_spark.did.preprocess import PanelData, preprocess_did

__all__ = ["ATTgt", "att_gt", "aggte", "PanelData", "preprocess_did"]
