from f_lite_tpu.data.dataset import (
    ImageDataset,
    center_crop_arr,
    center_crop_arr_simulator,
    generate_crop_size_list,
    var_center_crop_size_fn,
)
from f_lite_tpu.data.loader import DataLoader
from f_lite_tpu.data.samplers import (
    ResolutionBucketSampler,
    StatefulDistributedSampler,
)

__all__ = [
    "ImageDataset",
    "center_crop_arr",
    "center_crop_arr_simulator",
    "generate_crop_size_list",
    "var_center_crop_size_fn",
    "DataLoader",
    "ResolutionBucketSampler",
    "StatefulDistributedSampler",
]
