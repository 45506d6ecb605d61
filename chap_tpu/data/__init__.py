from chap_tpu.data.datasets import AcdcSliceDataset, AcdcVolumeDataset, SyntheticSliceDataset, SyntheticVolumeDataset, build_datasets  # noqa: F401
from chap_tpu.data.sampler import TwoStreamBatchSampler  # noqa: F401
from chap_tpu.data.transforms import RandomGenerator  # noqa: F401
from chap_tpu.data.pipeline import BatchLoader, prefetch_to_device  # noqa: F401
