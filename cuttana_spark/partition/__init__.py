from cuttana_spark.partition.config import CuttanaConfig
from cuttana_spark.partition.core import PartitionResult, cuttana_partition, cuttana_partition_df

__all__ = ["CuttanaConfig", "PartitionResult", "cuttana_partition", "cuttana_partition_df"]
