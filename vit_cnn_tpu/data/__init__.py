from .io import open_file, load_mat_key
from .normalize import minmax_per_band, minmax_global, apply_pca, filter_nan
from .registry import DATASETS, DATASETS_CONFIG, DatasetSpec, dataset_names, get_dataset
from .sampling import sample_gt, sampling_fixed_num, compute_imf_weights

__all__ = [
    "open_file", "load_mat_key", "minmax_per_band", "minmax_global",
    "apply_pca", "filter_nan", "DATASETS", "DATASETS_CONFIG", "DatasetSpec",
    "dataset_names", "get_dataset", "sample_gt", "sampling_fixed_num",
    "compute_imf_weights",
]
