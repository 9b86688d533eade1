from densereg_tpu.data.base import DatasetSpec, ShardWriter, ShardReader, get_dataset
from densereg_tpu.data.pipeline import InputPipeline, TestPipeline

__all__ = [
    "DatasetSpec",
    "ShardWriter",
    "ShardReader",
    "get_dataset",
    "InputPipeline",
    "TestPipeline",
]
