from cuttana_spark.partition.batched import (
    cuttana_partition_df_batched,
    cuttana_partition_df_spill,
)
from cuttana_spark.partition.config import CuttanaConfig
from cuttana_spark.partition.core import PartitionResult, cuttana_partition, cuttana_partition_df

__all__ = [
    "CuttanaConfig",
    "PartitionResult",
    "cuttana_partition",
    "cuttana_partition_df",
    "cuttana_partition_df_batched",
    "cuttana_partition_df_spill",
]
